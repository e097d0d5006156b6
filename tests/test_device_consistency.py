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
        # the reference-mirroring Cholesky solver stays a supported (and
        # chip-exercised) configuration, not dead surface
        (SDR, {"solver": "cholesky"}, 1e-1),
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


def _tiny_hubert():
    """Small random-weight encoder (real mHuBERT-147 weights are not
    distributable offline); architecture is what the consistency check
    exercises — matmul precision, conv stack, attention kernels."""
    import torch
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel

    from fast_speech_enhancement_metrics_tpu.models.hubert import convert_hf_hubert
    from fast_speech_enhancement_metrics_tpu.utils.convert_hubert import (
        config_from_hf,
    )

    torch.manual_seed(0)
    cfg = HFConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=96,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    model = HubertModel(cfg).eval()
    return convert_hf_hubert(model.state_dict(), config_from_hf(cfg)), config_from_hf(cfg)


@pytest.mark.parametrize("tpu_impl", ["einsum", "flash", "sdpa"])
def test_speechbertscore_cpu_vs_tpu(tpu_impl, speech_data):
    """The one metric with Pallas kernels and precision switches: CPU einsum
    reference vs the TPU einsum, flash, and single-pass sdpa attention
    paths (reference analogue: tests/test_cuda.py:8-23)."""
    from fast_speech_enhancement_metrics_tpu import SpeechBERTScore

    tpu = _tpu_device()
    cpu = jax.devices("cpu")[0]
    clean, noisy = speech_data["speech"], speech_data["noisy_speech"]
    params, config = _tiny_hubert()
    kw = dict(params=params, config=config, output_layer=3)

    on_cpu = SpeechBERTScore(device=cpu, attention_impl="einsum", **kw)
    on_tpu = SpeechBERTScore(device=tpu, attention_impl=tpu_impl, **kw)
    for a, b in zip(on_cpu(clean, noisy), on_tpu(clean, noisy)):
        assert a["SpeechBERTScore"] == pytest.approx(
            b["SpeechBERTScore"], abs=5e-3
        )
