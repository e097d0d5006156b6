"""LSD DFT-stage formulation A/B: 3x K=256 bf16 passes vs one stacked K=768.

bf16x3 computes xh@wh + xh@wl + xl@wh; stacking gives the SAME products in
one dot: [xh | xh | xl] @ [wh; wl; wh]. Identical FLOPs — the question is
whether Mosaic's sustained rate on one K=768 matmul beats three K=256 ones
(the fused LSD kernel's measured DFT stage runs ~50 TFLOP/s).
Also rows a single bf16 pass (the rate ceiling) for calibration.

Run: python tools/prof_lsd_k768.py
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
from fast_speech_enhancement_metrics_tpu.ops.stft import num_frames

BATCH, DUR = 64, 16
AUD = BATCH * DUR
N_FFT, HOP = 512, 256
CHAIN_K = 128

rng = np.random.default_rng(0)
c_sig = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
d_sig = jnp.asarray(
    np.asarray(c_sig) + 0.3 * rng.standard_normal(c_sig.shape), dtype=jnp.float32
)

W = np.asarray(_chunk_rdft_matrix_packed(N_FFT))
WH = W.astype(np.float32).astype(np.dtype("bfloat16").newbyteorder("=")) if False else None

dims = (((1,), (0,)), ((), ()))


def mm(p, q):
    return jax.lax.dot_general(p, q, dims, preferred_element_type=jnp.float32)


def dot_bf16(x, w_ref, ws_ref):
    return mm(x.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16))


def dot_x3(x, w_ref, ws_ref):
    w = w_ref[:]
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    return mm(xh, wh) + mm(xh, wl) + mm(xl, wh)


def dot_stacked(x, w_ref, ws_ref):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    xs = jnp.concatenate([xh, xh, xl], axis=1)  # (M, 3K) bf16, lane-aligned
    return mm(xs, ws_ref[:])


def make(dot):
    batch, t = c_sig.shape
    pad = N_FFT // 2
    f = num_frames(t + N_FFT, N_FFT, HOP)
    n_chunks = -(-(f + 1) // 8) * 8

    def prep(x):
        x = jnp.pad(x, ((0, 0), (pad, n_chunks * HOP - t - pad)))
        return x.reshape(batch, n_chunks, HOP)

    wh = W.astype(np.float32)
    wl = (W - wh.astype(np.dtype("float32"))).astype(np.float32)
    w32 = jnp.asarray(W)
    whb = jnp.asarray(W).astype(jnp.bfloat16)
    wlb = (jnp.asarray(W) - whb.astype(jnp.float32)).astype(jnp.bfloat16)
    ws = jnp.concatenate([whb, wlb, whb], axis=0)  # (3K, N) bf16

    def kernel(c_ref, d_ref, w_ref, ws_ref, out_ref):
        a_c = dot(c_ref[0], w_ref, ws_ref)
        a_d = dot(d_ref[0], w_ref, ws_ref)
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
        out_ref[:] = out_ref[:] + jnp.where(
            rows == b, jnp.sum(a_c) + jnp.sum(a_d), 0.0
        )

    sig_spec = pl.BlockSpec(
        (1, n_chunks, HOP), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            sig_spec,
            sig_spec,
            pl.BlockSpec(w32.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ws.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch, 128), lambda b: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
    )

    @jax.jit
    def run(c, d):
        def body(eps, _):
            s = jnp.sum(call(prep(c + eps), prep(d), w32, ws)[:, 0])
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return run


fns = {
    "bf16x1": make(dot_bf16),
    "bf16x3": make(dot_x3),
    "stackK768": make(dot_stacked),
}
for r in range(3):
    for name, fn in fns.items():
        np.asarray(fn(c_sig, d_sig))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = np.asarray(fn(c_sig, d_sig))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(
            f"round {r} {name:10s} {t * 1e3:6.2f} ms/eval (out={out[0]:.1f})",
            flush=True,
        )
