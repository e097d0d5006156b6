"""A/B: SpeechBERTScore attention einsum vs flash at the BENCH shape.

Round 2's crossover sweep (tools/prof_flash_crossover.py) ran at batch 4,
where the per-layer (4, 12, T, T) logits are ~123 MB and einsum won at every
length that fits. The bench runs rows = 2*64 = 128 at ~799 frames: the bf16
logits+weights round-trip is ~8 GB of HBM traffic per layer — a regime that
sweep never measured. This interleaves the two impls (A/B/A/B) so chip
time-sharing can't bias the verdict.

Run on an idle host: python tools/prof_sbs_attn.py [reps_per_round rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    init_params,
)

BATCH, DUR = 64, 16
AUD = BATCH * DUR

rng = np.random.default_rng(0)
clean = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
den = jnp.asarray(
    np.asarray(clean) + 0.3 * rng.standard_normal(clean.shape), dtype=jnp.float32
)
params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)

IMPLS = (sys.argv[3].split(",") if len(sys.argv) > 3 else ["einsum", "sdpa"])
metrics = {
    impl: SpeechBERTScore(params=params, act_dtype=jnp.bfloat16, attention_impl=impl)
    for impl in IMPLS
}


def call(m):
    return {k: np.asarray(v) for k, v in m._run_prepared(clean, den).items()}


for name, m in metrics.items():
    t0 = time.perf_counter()
    out = call(m)
    print(
        f"{name:8s} compile+first {time.perf_counter() - t0:7.1f} s "
        f"(score[0]={out['SpeechBERTScore'][0]:.6f})",
        flush=True,
    )

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
results = {k: [] for k in metrics}
for r in range(rounds):
    for name, m in metrics.items():
        t0 = time.perf_counter()
        for _ in range(reps):
            call(m)
        t = (time.perf_counter() - t0) / reps
        results[name].append(AUD / t)
        print(f"round {r} {name:8s} {t * 1e3:8.1f} ms -> {AUD / t:7.0f} audio-s/s", flush=True)

for name, vals in results.items():
    print(f"{name:8s} median {np.median(vals):7.0f} audio-s/s  (all: {[round(v) for v in vals]})")
