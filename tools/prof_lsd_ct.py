"""Round-5 A/B: factorized (radix-2 DIF) chunk DFT vs dense chunk-DFT in
the whole-signal LSD kernel, at the bench shape (batch 64 x 16 s).

The round-4 floor measurement (tools/prof_lsd_floor.py) put the DENSE
DFT-only stage at 0.921 ms/eval — below the 0.98 ms the 5x target needs
end-to-end. That was the floor of the dense formulation; the CT kernel
halves the MXU MACs (8 x 128x128 vs 2 x 256x512 per chunk pair). This probe
answers whether the DFT stage was actually MXU-bound.

Chain 128 per dispatch, interleaved rounds, same-process comparisons only.
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

from fast_speech_enhancement_metrics_tpu.ops.lsd_fused import lsd_scores

CHAIN = 128
BATCH, T = 64, 256000

rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, T)), dtype=jnp.float32)
d = jnp.asarray(
    np.asarray(c) + 0.3 * rng.standard_normal(c.shape), dtype=jnp.float32
)


def chain(impl, rows=1):
    def fn(cc, dd):
        return lsd_scores(
            cc, dd, 512, 256, 1e-8, denoised_scale="auto", dft_impl=impl,
            rows_per_step=rows,
        )

    @jax.jit
    def run(cc, dd, seed):
        s = 1.0 + seed * 1e-12
        out = None
        for _ in range(CHAIN):
            out = fn(cc * s, dd)
            s = 1.0 + jnp.abs(out[0]) * 1e-12
        return out[:4]

    return lambda i: np.asarray(run(c, d, jnp.float32(i)))


# score agreement on chip first
a = np.asarray(
    jax.jit(lambda cc, dd: lsd_scores(cc, dd, 512, 256, 1e-8,
                                      denoised_scale="auto", dft_impl="dense",
                                      rows_per_step=1))(c, d)
)
for impl, rows in (("ct", 1), ("dense", 2), ("dense", 4), ("dense", 8)):
    b = np.asarray(
        jax.jit(lambda cc, dd, i=impl, r=rows: lsd_scores(
            cc, dd, 512, 256, 1e-8, denoised_scale="auto", dft_impl=i,
            rows_per_step=r))(c, d)
    )
    print(f"on-chip agreement dense_r1 vs {impl}_r{rows}: "
          f"{np.abs(a - b).max():.3e}", flush=True)

calls = {"dense_r1": chain("dense", 1), "dense_r2": chain("dense", 2),
         "dense_r4": chain("dense", 4), "dense_r8": chain("dense", 8),
         "ct": chain("ct")}
for name, call in calls.items():
    t0 = time.perf_counter()
    call(0)
    print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in calls}
for r in range(6):
    for name, call in calls.items():
        t0 = time.perf_counter()
        call(r + 1)
        dt = (time.perf_counter() - t0) / CHAIN * 1e3
        results[name].append(dt)
        print(f"round {r} {name:9s} {dt:6.3f} ms/eval "
              f"({BATCH * T / 16000 / dt * 1e3 / 1e3:.0f}k audio-s/s)",
              flush=True)

print()
for name, ts in results.items():
    best = min(ts)
    print(f"{name:6s} best {best:.3f} ms/eval = "
          f"{BATCH * T / 16000 / best * 1e3 / 1e3:.0f}k audio-s/s")
