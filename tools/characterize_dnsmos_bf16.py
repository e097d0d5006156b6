"""Characterize DNSMOS conv_dtype=bfloat16 deviation vs fp32 'highest'.

The reference runs DNSMOS under fp16 autocast (fast_se_metrics/DNSMOS.py:119),
so reduced-precision activations are part of the reference's own semantics;
this sweep quantifies the bf16 analogue's deviation so the benchmarked
configuration has a documented, tested bound (VERDICT round-1 item 3).

Usage: python tools/characterize_dnsmos_bf16.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu import DNSMOS
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

DURATIONS = [2, 4, 10, 16]
SNRS = [(-5, -5), (0, 0), (10, 10), (20, 20)]
BATCH = 4

exact = DNSMOS(precision="highest")
fast = DNSMOS(conv_dtype=jnp.bfloat16, host_chunk=BATCH)

print(f"{'dur':>4} {'snr':>4} {'SIG dev':>9} {'BAK dev':>9} {'OVRL dev':>9}")
worst = {"SIG": 0.0, "BAK": 0.0, "OVRL": 0.0}
for dur in DURATIONS:
    for hi, lo in SNRS:
        _, noisy, _ = load_audio_data(dur, BATCH, 16000, snr_high=hi, snr_low=lo)
        a = exact(None, noisy)
        b = fast(None, noisy)
        devs = {
            k: max(abs(x[k] - y[k]) for x, y in zip(a, b))
            for k in ("SIG", "BAK", "OVRL")
        }
        for k in worst:
            worst[k] = max(worst[k], devs[k])
        print(
            f"{dur:>4} {hi:>4} {devs['SIG']:>9.4f} {devs['BAK']:>9.4f} "
            f"{devs['OVRL']:>9.4f}",
            flush=True,
        )
print("max over sweep:", {k: round(v, 4) for k, v in worst.items()})
