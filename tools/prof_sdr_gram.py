"""SDR correlation A/B on the real chip: chunk-DFT fused kernel vs the
time-domain Gram-matmul kernel (ops/sdr_corr_gram.py).

Probe hygiene per CLAUDE.md: every stage number comes from a >=128-deep
in-graph chain per dispatch (the ~25-40 ms relay RPC amortizes to
<0.3 ms/eval), variants are timed interleaved round-robin in one process,
and only same-depth numbers are compared.

Run: python tools/prof_sdr_gram.py [batch] [dur] [rounds]
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

from fast_speech_enhancement_metrics_tpu import SDR
from fast_speech_enhancement_metrics_tpu.ops.sdr_corr_fused import (
    correlation_lags_fused,
)
from fast_speech_enhancement_metrics_tpu.ops.sdr_corr_gram import (
    correlation_lags_gram,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CHAIN = 128

rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
d = jnp.asarray(np.asarray(c) + 0.3 * rng.standard_normal(c.shape), dtype=jnp.float32)


def corr_chain(fn, n=CHAIN):
    @jax.jit
    def run(c, d, seed):
        s = 1.0 + seed * 1e-12
        outs = None
        for _ in range(n):
            r0, b = fn(c * s, d)
            s = 1.0 + jnp.abs(r0[0, 0]) * 1e-12
            outs = (r0[:, :8], b[:, :8])
        return outs

    def call(i):
        return np.asarray(run(c, d, jnp.float32(i))[0])

    return call


VARIANTS = {
    "fused cb=128": corr_chain(
        lambda cc, dd: correlation_lags_fused(cc, dd, 512, chunk_block=128)
    ),
    "gram_x3 fb=512": corr_chain(
        lambda cc, dd: correlation_lags_gram(cc, dd, 512, frame_block=512)
    ),
    "gram_x3 fb=1000": corr_chain(
        lambda cc, dd: correlation_lags_gram(cc, dd, 512, frame_block=1000)
    ),
    "gram_x1 fb=512": corr_chain(
        lambda cc, dd: correlation_lags_gram(
            cc, dd, 512, frame_block=512, split="x1"
        )
    ),
}

# compile + warm
for name, call in VARIANTS.items():
    t0 = time.perf_counter()
    call(0)
    print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in VARIANTS}
for r in range(ROUNDS):
    for name, call in VARIANTS.items():
        t0 = time.perf_counter()
        call(r + 1)
        dt = (time.perf_counter() - t0) / CHAIN * 1e3
        results[name].append(dt)
        print(f"round {r} {name:16s} {dt:6.3f} ms/eval", flush=True)

print()
for name, ts in results.items():
    med = sorted(ts)[len(ts) // 2]
    print(f"MEDIAN {name:16s} {med:6.3f} ms/eval", flush=True)

# full-metric agreement + scanned throughput
print()
scores = {}
for impl in ("fused", "gram", "gram_x1"):
    m = SDR(corr_impl=impl)
    scores[impl] = np.asarray(m._compute_resampled(c, d)["SDR"])
for impl in ("gram", "gram_x1"):
    dev = np.abs(scores[impl] - scores["fused"]).max()
    print(f"score dev {impl} vs fused: {dev:.2e} dB", flush=True)
