"""Per-metric FLOP/byte analysis via XLA cost_analysis (CPU-compiled graphs).

Writes a roofline table: FLOPs per batch-64x16s evaluation, FLOPs per
audio-second, and the implied single-chip v5e ceiling (bf16 197 / fp32-ish
"highest" ~33 TFLOP/s effective). Graph FLOPs are platform-independent
enough for roofline context (TPU fuses differently but the dot/conv FLOPs
dominate and are identical).

Run: python tools/flops_analysis.py [batch] [dur]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16

from fast_speech_enhancement_metrics_tpu import DNSMOS, LSD, PESQ, SDR, STOI, SpeechBERTScore
from fast_speech_enhancement_metrics_tpu.models.hubert import MHUBERT_147_CONFIG, init_params

rng = np.random.default_rng(0)
clean = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
noisy = jnp.asarray(clean + 0.3 * rng.standard_normal(clean.shape), dtype=jnp.float32)

cases = {
    "PESQ": (PESQ(), True),
    "STOI": (STOI(sample_rate=16000), True),
    "SDR": (SDR(), True),
    "LSD": (LSD(), True),
    "DNSMOS": (DNSMOS(conv_dtype=jnp.bfloat16), False),
    "SpeechBERTScore": (
        SpeechBERTScore(params=init_params(jax.random.key(0), MHUBERT_147_CONFIG)),
        True,
    ),
}

audio_s = BATCH * DUR
print(f"batch={BATCH} dur={DUR}s  ({audio_s} audio-seconds per evaluation)\n")
print(f"{'metric':16s} {'GFLOP/eval':>11s} {'GFLOP/audio-s':>13s} "
      f"{'v5e bf16 ceil (audio-s/s)':>25s}")
for name, (metric, intrusive) in cases.items():
    fn = jax.jit(metric._compute_resampled)
    args = (clean if intrusive else None, noisy)
    compiled = fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    gflop = flops / 1e9
    per_as = gflop / audio_s
    ceiling = 197e3 / per_as if per_as else float("inf")
    print(f"{name:16s} {gflop:11.1f} {per_as:13.3f} {ceiling:25,.0f}")
