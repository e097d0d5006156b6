"""SpeechBERTScore round-5 A/B: fused attention-block Pallas megakernel
(ops/attn_block_pallas.py — QKV + exp2 softmax + AV + o-proj + residual +
LN in one kernel, per layer) vs the shipped einsum+exp2 default.

The round-4 stream-bound diagnosis (results/PROFILING.md) left this the one
unattempted formulation; the round-4 verdict requires it measured, not
risk-annotated. Both variants act_dtype=bf16, tanh GELU — the bench config.

Run: python tools/prof_sbs_block.py [reps rounds]
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


def call(m, c=clean, d=den):
    return {k: np.asarray(v) for k, v in m._run_prepared(c, d).items()}


# --- accuracy on a small fixture vs fp32 highest -----------------------------
cs, ds = clean[:8], den[:8]
oracle = call(
    SpeechBERTScore(params=params, precision="highest", gelu="erf",
                    softmax="exact", attention_impl="einsum"),
    cs, ds,
)["SpeechBERTScore"]


def acc(label, **kw):
    m = SpeechBERTScore(params=params, act_dtype=jnp.bfloat16, **kw)
    dev = np.abs(call(m, cs, ds)["SpeechBERTScore"] - oracle).max()
    print(f"# F1 dev vs fp32 [{label:12s}] {dev:.2e}", flush=True)


acc("einsum+exp2", softmax="exp2", attention_impl="einsum")
acc("block", softmax="exp2", attention_impl="block")
acc("block_ffn", softmax="exp2", attention_impl="block_ffn")
acc("block_int8", softmax="exp2", attention_impl="block_int8")

# --- throughput ---------------------------------------------------------------
def make(label, **kw):
    m = SpeechBERTScore(params=params, act_dtype=jnp.bfloat16, softmax="exp2", **kw)
    t0 = time.perf_counter()
    out = call(m)
    print(
        f"# compiled {label:10s} in {time.perf_counter()-t0:7.1f}s "
        f"(score[0]={out['SpeechBERTScore'][0]:.6f})",
        flush=True,
    )
    return m


metrics = {
    "einsum": make("einsum", attention_impl="einsum"),
    "block": make("block", attention_impl="block"),
    "block_ffn": make("block_ffn", attention_impl="block_ffn"),
    "block_int8": make("block_int8", attention_impl="block_int8"),
    "layer_block": make("layer_block", attention_impl="layer_block"),
}

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
        print(f"round {r} {name:10s} {t*1e3:8.1f} ms -> {AUD/t:7.0f} audio-s/s", flush=True)

print()
for name, vals in results.items():
    print(f"MEDIAN {name:10s} {np.median(vals):7.0f} audio-s/s  (all: {[round(v) for v in vals]})")
