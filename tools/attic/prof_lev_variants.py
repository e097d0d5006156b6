"""Levinson kernel variant A/B on the real chip: vpu-reduce vs dot-reduce.

Times the solve stage alone through a 16-deep dependency chain (RPC
amortized), interleaved rounds. Run on an idle host.

Run: python tools/prof_lev_variants.py
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

from fast_speech_enhancement_metrics_tpu.ops.levinson_pallas import levinson_solve_fused

BATCH = 64
rng = np.random.default_rng(0)
r0_host = np.abs(rng.standard_normal((BATCH, 1))) + 1.0
r0 = jnp.asarray(
    (0.95 ** np.arange(512))[None] * r0_host + 0.01 * rng.standard_normal((BATCH, 512)),
    dtype=jnp.float32,
)
r0 = r0.at[:, 0].set(jnp.abs(r0[:, 0]) + 1.0)
b = jnp.asarray(rng.standard_normal((BATCH, 512)), dtype=jnp.float32)

N_CHAIN = int(os.environ.get("LEV_CHAIN", 16))


def chain(variant):
    @jax.jit
    def run(r0, b):
        x = b
        for _ in range(N_CHAIN):
            x = levinson_solve_fused(r0, x * jnp.float32(1e-3), variant=variant)
        return x[:, :8]

    return lambda: np.asarray(run(r0, b))


fns = {v: chain(v) for v in (sys.argv[1:] or ["vpu", "flat", "flat_u4", "flat_u8"])}
for name, fn in fns.items():
    t0 = time.perf_counter()
    out = fn()
    print(f"{name:10s} compile+first {time.perf_counter() - t0:6.1f} s", flush=True)

for r in range(3):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(4):
            fn()
        t = (time.perf_counter() - t0) / 4
        print(
            f"round {r} {name:10s} {t * 1e3:7.2f} ms -> {t / N_CHAIN * 1e3:5.2f} ms/solve",
            flush=True,
        )
