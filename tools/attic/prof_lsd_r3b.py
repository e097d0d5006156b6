"""Decompose the fused LSD kernel's time: DFT matmul vs window/mag vs log chain.

Runs variant kernels sharing the full kernel's grid/BlockSpecs/DMA pattern but
truncating the compute after successive stages:
  mm     — chunk-DFT matmuls only (MXU + DMA floor)
  mag    — + frequency-domain Hann + magnitudes (VPU combine stage)
  full   — + log-ratio chain (the real kernel, ops/lsd_fused.py)
Differences between consecutive rows are the stage costs. Everything is timed
with forced host fetches; run on an idle host.

Run: python tools/prof_lsd_r3b.py [batch] [dur] [frame_block]
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
from fast_speech_enhancement_metrics_tpu.ops.lsd_fused import lsd_scores
from fast_speech_enhancement_metrics_tpu.ops.stft import num_frames

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FB = int(sys.argv[3]) if len(sys.argv) > 3 else 256
N_FFT, HOP, EPS = 512, 256, 1e-8
AUD = BATCH * DUR

rng = np.random.default_rng(0)
c_sig = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
d_sig = jnp.asarray(
    np.asarray(c_sig) + 0.3 * rng.standard_normal(c_sig.shape), dtype=jnp.float32
)


def dot_bf16x3(x, w):
    dims = (((1,), (0,)), ((), ()))
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(p, q):
        return jax.lax.dot_general(p, q, dims, preferred_element_type=jnp.float32)

    return mm(xh, wh) + mm(xh, wl) + mm(xl, wh)


def window_mag(b1, b2, w_ref):
    chunks = jnp.concatenate([b1[0], b2[0][:1]], axis=0)
    a = dot_bf16x3(chunks, w_ref[:])
    nb = a.shape[-1] // 2
    sign = 1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) % 2
    ).astype(jnp.float32)
    are, aim = a[:, :nb], a[:, nb:]
    alt = 1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, chunks.shape, 1) % 2
    ).astype(jnp.float32)
    anyq = jnp.sum(chunks * alt, axis=1, keepdims=True)
    xre = are[:-1] + sign * are[1:]
    xim = aim[:-1] + sign * aim[1:]
    xnyq = anyq[:-1] + anyq[1:]
    yre_i = 0.5 * xre[:, 1:-1] - 0.25 * (xre[:, :-2] + xre[:, 2:])
    yim_i = 0.5 * xim[:, 1:-1] - 0.25 * (xim[:, :-2] + xim[:, 2:])
    m_int = yre_i * yre_i + yim_i * yim_i
    y0 = 0.5 * xre[:, :1] - 0.5 * xre[:, 1:2]
    ylo_re = 0.5 * xre[:, -1:] - 0.25 * (xre[:, -2:-1] + xnyq)
    ylo_im = 0.5 * xim[:, -1:] - 0.25 * xim[:, -2:-1]
    ynyq = 0.5 * xnyq - 0.5 * xre[:, -1:]
    m_edge = jnp.concatenate(
        [y0 * y0, ylo_re * ylo_re + ylo_im * ylo_im, ynyq * ynyq], axis=1
    )
    return m_int, m_edge


def make_kernel(stage):
    def kernel(c1, c2, d1, d2, w, out, *, frame_block, n_frames):
        b = pl.program_id(0)
        j = pl.program_id(1)
        if stage == "mm":
            chunks_c = jnp.concatenate([c1[0], c2[0][:1]], axis=0)
            chunks_d = jnp.concatenate([d1[0], d2[0][:1]], axis=0)
            part = jnp.sum(dot_bf16x3(chunks_c, w[:])) + jnp.sum(
                dot_bf16x3(chunks_d, w[:])
            )
        else:
            c_int, c_edge = window_mag(c1, c2, w)
            d_int, d_edge = window_mag(d1, d2, w)
            if stage == "mag":
                part = (
                    jnp.sum(c_int) + jnp.sum(c_edge) + jnp.sum(d_int) + jnp.sum(d_edge)
                )
            else:
                raise ValueError(stage)

        @pl.when((b == 0) & (j == 0))
        def _():
            out[:] = jnp.zeros_like(out)

        rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out[:] = out[:] + jnp.where((rows == b) & (cols == j), part, 0.0)

    return kernel


def variant(stage):
    batch, t = c_sig.shape
    pad = N_FFT // 2
    f = num_frames(t + N_FFT, N_FFT, HOP)
    nfb = pl.cdiv(f, FB)
    n_chunks = (nfb + 1) * FB

    def prep(x):
        x = jnp.pad(x, ((0, 0), (pad, n_chunks * HOP - t - pad)))
        return x.reshape(batch, n_chunks, HOP)

    w = jnp.asarray(_chunk_rdft_matrix_packed(N_FFT))
    wspec = pl.BlockSpec(w.shape, lambda b, j: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((batch, nfb), lambda b, j: (0, 0), memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((1, FB, HOP), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec(
        (1, FB, HOP), lambda b, j: (b, j + 1, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(make_kernel(stage), frame_block=FB, n_frames=f)

    @jax.jit
    def run(c, d):
        parts = pl.pallas_call(
            kernel,
            grid=(batch, nfb),
            in_specs=[spec1, spec2, spec1, spec2, wspec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((batch, nfb), jnp.float32),
        )(prep(c), prep(c), prep(d), prep(d), w)
        return jnp.sum(parts, axis=1)

    return run


def full_fn(c, d):
    return lsd_scores(c, d, N_FFT, HOP, EPS, frame_block=FB)


CHAIN_K = 32


def chain(fn):
    """K loop-carried evaluations per dispatch so the ~25 ms relay RPC
    amortizes 1/K (same defense as the scanned bench protocol: the carry is
    data-dependent, nothing hoists)."""

    @jax.jit
    def run(c, d):
        def body(eps, _):
            s = jnp.sum(fn(c + eps, d))
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return run


def timeit(fn, reps=4):
    np.asarray(fn(c_sig, d_sig))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(fn(c_sig, d_sig))
    return (time.perf_counter() - t0) / reps / CHAIN_K, out


rows = [
    ("mm", chain(variant("mm"))),
    ("mag", chain(variant("mag"))),
    ("full", chain(full_fn)),
]
for _ in range(2):  # two rounds, interleaved, to see chip contention
    for name, fn in rows:
        t, out = timeit(fn)
        print(
            f"{name:5s} {t * 1e3:7.2f} ms/eval -> {AUD / t:8.0f} audio-s/s "
            f"(out[0]={np.ravel(out)[0]:.4f})",
            flush=True,
        )
