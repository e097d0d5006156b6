"""LSD fused-kernel frame_block sweep on the real chip.

frame_block sets the per-grid-step matmul height and the grid size
(batch x ceil(frames/FB)); larger blocks mean fewer, bigger MXU ops.
Times the full scanned protocol per value.

Run: python tools/prof_lsd_fb.py [batch] [dur] [fb ...]
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

from fast_speech_enhancement_metrics_tpu import LSD

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FBS = [int(a) for a in sys.argv[3:]] or [128, 256, 512, 1024]
aud = BATCH * DUR

rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
d = jnp.asarray(np.asarray(c) + 0.3 * rng.standard_normal(c.shape), dtype=jnp.float32)

for fb in FBS:
    m = LSD()
    m.frame_block = fb
    runner = _scanned(m._compute_resampled, intrusive=True)
    t0 = time.perf_counter()
    out = {k: np.asarray(v) for k, v in runner(c, d, 0).items()}
    print(f"fb={fb:5d} compile+first {time.perf_counter()-t0:6.1f} s "
          f"(score[0]={out['LSD'][0][0]:.6f})", flush=True)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = {k: np.asarray(v) for k, v in runner(c, d, 1 + i).items()}
    t = (time.perf_counter() - t0) / reps
    print(f"fb={fb:5d} scanned {t*1e3:8.1f} ms/dispatch -> "
          f"{aud*SCAN_K/t:8.0f} audio-s/s", flush=True)
