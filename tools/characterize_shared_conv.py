"""Characterize DNSMOS shared-conv deviation vs the exact windowed mode.

Sweeps durations x SNRs (the axes that move window count and signal
stationarity) and reports the max |shared - exact| per score dimension.
Runs on whatever backend is active; pass --cpu to force the CPU backend
(deviation is an algorithmic property — window boundary context — not a
hardware one, so CPU fp32 numbers transfer to TPU 'highest').

Usage: python tools/characterize_shared_conv.py [--cpu]
"""

import sys

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from fast_speech_enhancement_metrics_tpu import DNSMOS
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

DURATIONS = [2, 4, 10, 16]
SNRS = [(-5, -5), (0, 0), (10, 10), (20, 20)]
BATCH = 4

exact = DNSMOS(precision="highest")
shared = DNSMOS(precision="highest", shared_conv=True, host_chunk=BATCH)

print(f"{'dur':>4} {'snr':>4} {'SIG dev':>9} {'BAK dev':>9} {'OVRL dev':>9}")
worst = {"SIG": 0.0, "BAK": 0.0, "OVRL": 0.0}
for dur in DURATIONS:
    for hi, lo in SNRS:
        _, noisy, _ = load_audio_data(dur, BATCH, 16000, snr_high=hi, snr_low=lo)
        a = exact(None, noisy)
        b = shared(None, noisy)
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
