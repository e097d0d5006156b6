"""LSD kernel floor decomposition (round-4 verdict item: measure, don't
assert). Variants of the zero-copy whole-signal kernel at the bench shape:

  full      — shipped kernel (DFT + freq-domain Hann + mags + log-ratio)
  no_log    — log-ratio chain replaced by (c_sq - d_sq)^2 (keeps mags)
  mags_only — Hann + magnitudes, no per-bin ratio at all (sum of mags)
  dft_only  — chunk-DFT matmul + direct reduce (the MXU floor)

Chain depth 128 per dispatch, interleaved rounds. The full-vs-dft_only gap
is the intrinsic VPU epilogue; if dft_only >= ~0.98 ms/eval the 5x target
(1.04 M audio-s/s) is below even the matmul floor.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

from fast_speech_enhancement_metrics_tpu.ops.dft import _chunk_rdft_matrix_packed
from fast_speech_enhancement_metrics_tpu.ops.lsd_fused import (
    _chunk_nyquist,
    _dot_f32,
    _hann_mag_sq,
    _sign_lane,
    _sq_log_ratio,
)

CHAIN = 128
BATCH, T, HOP = 64, 256000, 256
EPS = 1e-8


def make(stage):
    def kernel(scale_ref, c_ref, d_ref, w_ref, out_ref, *, eps, precision):
        b = pl.program_id(0)

        def mags(ref, scale):
            chunks = ref[0]
            if scale is not None:
                chunks = chunks * scale
            a = _dot_f32(chunks, w_ref[:], precision)
            if stage == "dft_only":
                return a
            nb = a.shape[-1] // 2
            sign = _sign_lane(nb)
            are, aim = a[:, :nb], a[:, nb:]
            q = _chunk_nyquist(chunks)
            m_int, m_edge = _hann_mag_sq(
                are[:-1] + sign * are[1:],
                aim[:-1] + sign * aim[1:],
                q[:-1] + q[1:],
            )
            return m_int, m_edge

        if stage == "dft_only":
            ca = mags(c_ref, None)
            da = mags(d_ref, scale_ref[b, 0])
            total = jnp.sum(ca * ca) + jnp.sum(da * da)
        else:
            ci, ce = mags(c_ref, None)
            di, de = mags(d_ref, scale_ref[b, 0])
            if stage == "mags_only":
                total = jnp.sum(ci) + jnp.sum(ce) + jnp.sum(di) + jnp.sum(de)
            elif stage == "no_log":
                diff_i, diff_e = ci - di, ce - de
                frame_ms = (
                    jnp.sum(diff_i * diff_i, axis=1, keepdims=True)
                    + jnp.sum(diff_e * diff_e, axis=1, keepdims=True)
                ) / (ci.shape[1] + 3)
                total = jnp.sum(jnp.sqrt(frame_ms))
            else:
                frame_ms = (
                    jnp.sum(_sq_log_ratio(ci, di, eps), axis=1, keepdims=True)
                    + jnp.sum(_sq_log_ratio(ce, de, eps), axis=1, keepdims=True)
                ) / (ci.shape[1] + 3)
                total = jnp.sum(jnp.sqrt(frame_ms))

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
        out_ref[:] = out_ref[:] + jnp.where(rows == b, total, 0.0)

    def run(c, d, scale):
        batch, t = c.shape
        nc = t // HOP
        cc = c.reshape(batch, nc, HOP)
        dc = d.reshape(batch, nc, HOP)
        w = jnp.asarray(_chunk_rdft_matrix_packed(2 * HOP))
        sig_spec = pl.BlockSpec(
            (1, nc, HOP), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        sums = pl.pallas_call(
            functools.partial(kernel, eps=EPS, precision="high"),
            grid=(batch,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                sig_spec,
                sig_spec,
                pl.BlockSpec(w.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (batch, 128), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        )(scale, cc, dc, w)
        return sums[:, 0] / (nc + 1)

    return run


rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, T)), dtype=jnp.float32)
d = jnp.asarray(np.asarray(c) + 0.3 * rng.standard_normal(c.shape), dtype=jnp.float32)
scale = jnp.ones((BATCH, 1), jnp.float32)


def chain(fn):
    @jax.jit
    def run(c, d, seed):
        s = 1.0 + seed * 1e-12
        out = None
        for _ in range(CHAIN):
            out = fn(c * s, d, scale)
            s = 1.0 + jnp.abs(out[0]) * 1e-12
        return out[:4]

    return lambda i: np.asarray(run(c, d, jnp.float32(i)))


calls = {s: chain(make(s)) for s in ("full", "no_log", "mags_only", "dft_only")}
for name, call in calls.items():
    t0 = time.perf_counter()
    call(0)
    print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in calls}
for r in range(4):
    for name, call in calls.items():
        t0 = time.perf_counter()
        call(r + 1)
        dt = (time.perf_counter() - t0) / CHAIN * 1e3
        results[name].append(dt)
        print(f"round {r} {name:10s} {dt:6.3f} ms/eval", flush=True)

print()
for name, ts in results.items():
    med = sorted(ts)[len(ts) // 2]
    print(f"MEDIAN {name:10s} {med:6.3f} ms/eval -> {BATCH*16/med*1000:8.0f} audio-s/s",
          flush=True)
