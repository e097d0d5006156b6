"""SDR solver A/B on the real chip: XLA Levinson scan vs fused Pallas kernel.

Times the full SDR metric through the scanned device-throughput protocol
(the benchmarked configuration) with each solver, plus the solve stage alone.

Run: python tools/prof_sdr_pallas.py [batch] [dur]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    SCAN_K,
    _scanned,
    configure_cache,
)

configure_cache()

from fast_speech_enhancement_metrics_tpu import SDR
from fast_speech_enhancement_metrics_tpu.ops.levinson_pallas import levinson_solve_fused
from fast_speech_enhancement_metrics_tpu.ops.toeplitz import levinson_solve

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
aud = BATCH * DUR

rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
d = jnp.asarray(np.asarray(c) + 0.3 * rng.standard_normal(c.shape), dtype=jnp.float32)


def time_calls(fn, reps=4):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


# solve stage alone (pre-computed correlations, solve in a 16-deep chain)
r0_host = np.abs(rng.standard_normal((BATCH, 1))) + 1.0
r0 = jnp.asarray(
    (0.95 ** np.arange(512))[None] * r0_host
    + 0.01 * rng.standard_normal((BATCH, 512)),
    dtype=jnp.float32,
)
r0 = r0.at[:, 0].set(jnp.abs(r0[:, 0]) + 1.0)
b = jnp.asarray(rng.standard_normal((BATCH, 512)), dtype=jnp.float32)


def chain(solver, n=16):
    @jax.jit
    def run(r0, b):
        x = b
        for _ in range(n):
            x = solver(r0, x * jnp.float32(1e-3))
        return x[:, :8]

    return lambda: np.asarray(run(r0, b))


for name, solver in (("xla scan", levinson_solve), ("pallas", levinson_solve_fused)):
    t = time_calls(chain(solver))
    print(f"solve x16 [{name:9s}] {t*1e3:8.2f} ms -> {t/16*1e3:6.2f} ms/solve",
          flush=True)

for name, kw in (("levinson_xla", {"solver": "levinson_xla"}),
                 ("pallas", {"solver": "levinson"})):
    m = SDR(**kw)
    runner = _scanned(m._compute_resampled, intrusive=True)
    outs = np.asarray(runner(c, d, 0)["SDR"])
    t = time_calls(lambda: np.asarray(runner(c, d, 1)["SDR"]))
    print(f"SDR scanned [{name:12s}] {t*1e3:8.1f} ms/dispatch -> "
          f"{aud*SCAN_K/t:8.0f} audio-s/s (score[0]={outs[0,0]:.3f})", flush=True)
