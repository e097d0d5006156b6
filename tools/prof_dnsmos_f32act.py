"""DNSMOS deviation-class candidate: fp32 activations + default-precision
(bf16 MXU passes) convs, vs bf16 activations, vs the fp32-highest oracle.

The bf16-activation bench config exceeds the reference's published 6e-3
fp16 class on the sweep (SIG 2.2e-2 — results/dnsmos_deviation.md), and
per-layer selection can't fix it (tools/characterize_dnsmos_layers.py:
error is distributed). The remaining knob is keeping activations fp32 and
letting only the MXU passes truncate. TPU-only measurement (CPU matmuls
don't truncate). Durations {4, 10, 16} s x SNR {-5, 10} x batch 16.

Run: python tools/prof_dnsmos_f32act.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    SCAN_K,
    _scanned,
    configure_cache,
)

configure_cache()

from fast_speech_enhancement_metrics_tpu import DNSMOS
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

exact = DNSMOS(precision="highest", conv_dtype=None)
f32act = DNSMOS(precision="default", conv_dtype=None)
bf16act = DNSMOS(precision="default", conv_dtype=jnp.bfloat16)

worst = {"f32act": 0.0, "bf16act": 0.0}
for dur in (4, 10, 16):
    for snr in (-5, 10):
        _, noisy, _ = load_audio_data(dur, 16, 16000, snr_high=snr, snr_low=snr)
        oc = exact(None, noisy)
        for name, m in (("f32act", f32act), ("bf16act", bf16act)):
            got = m(None, noisy)
            dev = max(
                abs(a[k] - b[k])
                for a, b in zip(oc, got)
                for k in ("SIG", "BAK", "OVRL")
            )
            worst[name] = max(worst[name], dev)
            print(f"dur {dur:3d} snr {snr:3d} {name:8s} dev {dev:.4f}", flush=True)
print("worst:", {k: round(v, 4) for k, v in worst.items()}, flush=True)

# throughput at the bench shape
rng = np.random.default_rng(0)
den = jnp.asarray(0.1 * rng.standard_normal((64, 16 * 16000)), dtype=jnp.float32)
for name, m in (("bf16act", bf16act), ("f32act", f32act)):
    runner = _scanned(m._compute_resampled, intrusive=False)
    np.asarray(runner(None, den, 0)["OVRL"])
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        np.asarray(runner(None, den, r + 1)["OVRL"])
        ts.append(64 * 16 * SCAN_K / (time.perf_counter() - t0))
    print(f"{name:8s} median {np.median(ts):8.0f} audio-s/s", flush=True)
