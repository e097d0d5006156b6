"""Which DNSMOS conv layers drive the bf16-activation deviation?

The benchmarked config (conv_dtype=bf16) measures SIG 0.0224 max over the
duration x SNR sweep vs the reference's published 6e-3 fp16 class
(results/dnsmos_deviation.md). This sweep isolates per-layer storage
rounding (CPU backend: matmuls stay fp32, so conv_dtype is the only
reduced-precision knob — the same isolation the round-2 characterization
used) by casting the activation stream to bf16 only for chosen layers.

Usage: python tools/characterize_dnsmos_layers.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu import DNSMOS
from fast_speech_enhancement_metrics_tpu.models import dnsmos_net
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

DURATIONS = [2, 4, 10, 16]
SNRS = [-5, 0, 10, 20]
BATCH = 4

_orig = dnsmos_net._conv_layer
MASK = [False] * 7  # True = bf16 storage for this layer's input+output


def patched(params, x, n, precision, pack=None):
    x = x.astype(jnp.bfloat16 if MASK[n] else jnp.float32)
    return _orig(params, x, n, precision, pack)


dnsmos_net._conv_layer = patched

fixtures = []
for dur in DURATIONS:
    for snr in SNRS:
        _, noisy, _ = load_audio_data(dur, BATCH, 16000, snr_high=snr, snr_low=snr)
        fixtures.append(noisy)

exact = DNSMOS(precision="highest", conv_dtype=None)
oracle = [exact(None, x) for x in fixtures]


def sweep(label, mask):
    MASK[:] = mask
    m = DNSMOS(precision="highest", conv_dtype=None)  # dtype via the patch
    worst = 0.0
    for fx, oc in zip(fixtures, oracle):
        got = m(None, fx)
        for a, b in zip(oc, got):
            worst = max(worst, *(abs(a[k] - b[k]) for k in ("SIG", "BAK", "OVRL")))
    print(f"{label:24s} max dev {worst:.4f}", flush=True)
    return worst


sweep("all fp32 (sanity)", [False] * 7)
sweep("all bf16", [True] * 7)
for n in range(7):
    sweep(f"only conv{n} bf16", [i == n for i in range(7)])
sweep("conv0-3 bf16 (big ones)", [True] * 4 + [False] * 3)
sweep("conv0-1 bf16", [True] * 2 + [False] * 5)
sweep("conv1-6 bf16 (conv0 fp32)", [False] + [True] * 6)
