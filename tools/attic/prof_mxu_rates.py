"""Sustained in-kernel MXU rates vs matmul shape (bf16, fp32 accumulate).

One pallas_call per shape: the grid revisits a resident (M, K) input and the
kernel runs 32 chained dot_generals per step (each iteration's input is
perturbed by a scalar from the previous product, so nothing is elided).
HBM sees only the initial block loads — this is the pure in-VMEM MXU rate,
the right "peak" for kernels whose K/N are fixed by their algorithm (LSD's
chunk DFT: K = 256; DNSMOS convs: K = 9*C_in, N = C_out).

Run: python tools/prof_mxu_rates.py
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

INNER = 32


def chain_kernel(x_ref, w_ref, o_ref, *, k):
    def body(i, carry):
        y = jax.lax.dot_general(
            carry, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # loop-carried dependency, kept vectorial as a (1, K) row broadcast
        # (sublane-only) — a scalar extraction here measured ~47 us/iteration
        # of stall, and Mosaic cannot broadcast (1,1) in both dimensions
        kk, nn = carry.shape[1], y.shape[1]
        row = y[:1, :] * 1e-30
        row = row[:, :kk] if nn >= kk else jnp.pad(row, ((0, 0), (0, kk - nn)))
        return carry * (1.0 + row).astype(carry.dtype)

    x = jax.lax.fori_loop(0, INNER, body, x_ref[:])

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] = o_ref[:] + jnp.sum(x[:8, :128])


def bench(m, k, n, steps=16, reps=4):
    x = jnp.ones((m, k), dtype=jnp.bfloat16)
    w = jnp.ones((k, n), dtype=jnp.bfloat16)

    call = pl.pallas_call(
        functools.partial(chain_kernel, k=k),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    run = jax.jit(lambda x, w: call(x, w)[0, 0])

    np.asarray(run(x, w))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(x, w))
    t = (time.perf_counter() - t0) / reps
    fl = 2 * m * k * n * steps * INNER
    print(
        f"M={m:5d} K={k:5d} N={n:5d}  {t * 1e3:7.2f} ms  {fl / t / 1e12:6.1f} TFLOP/s",
        flush=True,
    )


for m, k, n in [
    (1024, 256, 512),
    (2560, 256, 512),
    (1024, 512, 512),
    (1024, 1024, 512),
    (1024, 512, 1024),
    (1024, 1152, 64),
    (1024, 1152, 128),
    (1024, 384, 192),
    (1024, 1024, 1024),
]:
    bench(m, k, n)
