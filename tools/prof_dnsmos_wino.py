"""DNSMOS round-5 A/B: Winograd F(2x2, 3x3) trunk vs direct convolution.

Round-4 verdict item #3: the 29%-of-peak trunk floor claim only covered
direct convolution; conv1 measures at 72% of its FLOP peak, so the 2.25x
matmul-MAC cut is the one untried lever. Two comparisons:

  bf16  — conv_dtype=bfloat16 (the benched headline config)
  high  — precision="high" fp32 activations (the in-class config; a
          Winograd win here would beat the reference GPU INSIDE its 6e-3
          class — verdict item #4)

Plus per-config score deviation vs the fp32 "highest" oracle on a small
fixture. Full-metric calls (shared-conv plan), interleaved rounds.

Run: python tools/prof_dnsmos_wino.py [reps rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

from fast_speech_enhancement_metrics_tpu import DNSMOS

BATCH, DUR = 64, 16
AUD = BATCH * DUR

rng = np.random.default_rng(0)
den = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)


def call(m, d=den):
    return {k: np.asarray(v) for k, v in m._run_prepared(None, d).items()}


# --- accuracy on a small fixture vs fp32 highest -----------------------------
ds = den[:8]
oracle = call(DNSMOS(precision="highest"), ds)


def acc(label, chunk_gb=None, **kw):
    m = DNSMOS(**kw)
    if chunk_gb is not None:
        m.shared_chunk_gb = chunk_gb  # attribute, not a ctor kwarg
    out = call(m, ds)
    dev = max(np.abs(out[k] - oracle[k]).max() for k in ("SIG", "BAK", "OVRL"))
    print(f"# max-over-scores dev vs fp32 [{label:12s}] {dev:.2e}", flush=True)


acc("direct_bf16", conv_dtype=jnp.bfloat16)
acc("wino_bf16", conv_dtype=jnp.bfloat16, conv_pack="winograd", chunk_gb=0.4)
acc("direct_high", precision="high")
acc("wino_high", precision="high", conv_pack="winograd", chunk_gb=0.4)

# --- throughput ---------------------------------------------------------------
def make(label, chunk_gb=None, **kw):
    m = DNSMOS(**kw)
    if chunk_gb is not None:
        m.shared_chunk_gb = chunk_gb
    t0 = time.perf_counter()
    out = call(m)
    print(
        f"# compiled {label:12s} in {time.perf_counter()-t0:7.1f}s "
        f"(OVRL[0]={out['OVRL'][0]:.5f})",
        flush=True,
    )
    return m


metrics = {
    "direct_bf16": make("direct_bf16", conv_dtype=jnp.bfloat16),
    # winograd materializes 16 V/M tensors per layer in XLA: row-chunk to
    # keep transients inside HBM (the unchunked graph crashed the worker)
    "wino_bf16": make("wino_bf16", conv_dtype=jnp.bfloat16, conv_pack="winograd", chunk_gb=0.4),
    "direct_high": make("direct_high", precision="high"),
    "wino_high": make("wino_high", precision="high", conv_pack="winograd", chunk_gb=0.4),
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
        print(f"round {r} {name:12s} {t*1e3:8.1f} ms -> {AUD/t:7.0f} audio-s/s", flush=True)

print()
for name, vals in results.items():
    print(f"MEDIAN {name:12s} {np.median(vals):7.0f} audio-s/s  (all: {[round(v) for v in vals]})")
