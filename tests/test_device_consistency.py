"""CPU-JAX vs TPU consistency (reference: tests/test_cuda.py analogue).

Runs only with ``FSEM_TEST_TPU=1`` (the default test config forces the CPU
platform — see conftest.py). Every metric's TPU result must match the
CPU-JAX result to the reference's CPU<->GPU tolerance (abs 5e-3; SDR relaxed
to 1e-1 for Toeplitz conditioning, DNSMOS compared in its exact 'highest'
mode).
"""

import os

import jax
import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import DNSMOS, LSD, PESQ, SDR, STOI

pytestmark = pytest.mark.skipif(
    not os.environ.get("FSEM_TEST_TPU"),
    reason="TPU device tests disabled (set FSEM_TEST_TPU=1)",
)


def _tpu_device():
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        pytest.skip("no TPU device visible")
    return tpus[0]


@pytest.mark.parametrize(
    "metric_cls,kwargs,tol",
    [
        (LSD, {}, 5e-3),
        (SDR, {}, 1e-1),
        (PESQ, {}, 5e-3),
        (STOI, {"sample_rate": 16000}, 5e-3),
        (DNSMOS, {"precision": "highest"}, 5e-3),
    ],
)
def test_cpu_vs_tpu(metric_cls, kwargs, tol, speech_data):
    tpu = _tpu_device()
    cpu = jax.devices("cpu")[0]
    clean, noisy = speech_data["speech"], speech_data["noisy_speech"]

    on_cpu = metric_cls(device=cpu, **kwargs)
    on_tpu = metric_cls(device=tpu, **kwargs)
    args = (None, noisy) if on_cpu.NON_INTRUSIVE else (clean, noisy)
    for a, b in zip(on_cpu(*args), on_tpu(*args)):
        for key in a:
            assert a[key] == pytest.approx(b[key], abs=tol), key
