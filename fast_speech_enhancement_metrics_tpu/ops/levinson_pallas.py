"""Batched Levinson-Durbin Toeplitz solve as a single Pallas TPU kernel.

The XLA formulation (ops/toeplitz.py::levinson_solve) runs the n-1 recursion
steps as a ``lax.scan`` whose per-step kernels each round-trip the four
(B, n) carry arrays through HBM: ~511 steps x ~1 MB of traffic plus per-kernel
launch overhead dominate SDR's solve time (reference role:
fast_se_metrics/SDR.py:7-31, the Cholesky solve of the 512-tap normal
equations). Here the entire recursion runs inside ONE kernel with every
carry resident in VMEM: HBM sees only the (B, n) inputs once and the (B, n)
solution once (~0.5 MB total), and each step is pure VPU work.

Same recursion as the XLA path (see toeplitz.py for the derivation):

    ef    = <r1, v>                 ex   = <r1, y>
    g     = shift_right(v)
    u'    = (u - ef*g) / (1 - ef^2) v'   = (g - ef*u) / (1 - ef^2)
    x'    = x + (b[k] - ex) * v'    y'   = shift_right(y) + (b[k] - ex) * u'

TPU mapping notes:
* ``b[k]`` (a per-step lane extraction XLA would turn into a dynamic slice)
  is folded into the ``ex`` reduction: mu = sum(onehot(k)*bn - r1*y) — one
  fused multiply-reduce, no dynamic lane indexing.
* ``shift_right`` is a static pad+slice on the lane axis (Mosaic lowers it
  to a lane shift); the one-lane r1 padding keeps every array (B, n) so the
  whole state tiles as fp32 (8, 128) vregs with no remainders at n = 512.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _levinson_kernel(r1_ref, bn_ref, out_ref, *, n: int):
    r1 = r1_ref[:]  # (B, n): normalized tail r[1:]/r[0], lane n-1 zero
    bn = bn_ref[:]  # (B, n): normalized rhs b/r[0]

    col = jax.lax.broadcasted_iota(jnp.int32, r1.shape, 1)
    e0 = (col == 0).astype(jnp.float32)

    u0 = e0
    x0 = bn * e0  # x starts as [b0, 0, ...]
    v0, y0 = u0, x0

    def shift_right(a):
        return jnp.pad(a, ((0, 0), (1, 0)))[:, :-1]

    def step(k, carry):
        u, v, x, y = carry
        ef = jnp.sum(r1 * v, axis=1, keepdims=True)
        # b[k+1] extraction and the <r1, y> dot share one fused reduce
        sel = (col == k + 1).astype(jnp.float32)
        mu = jnp.sum(sel * bn - r1 * y, axis=1, keepdims=True)
        denom = 1.0 - ef * ef
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        recip = 1.0 / denom
        g = shift_right(v)
        u_new = (u - ef * g) * recip
        v_new = (g - ef * u) * recip
        x_new = x + mu * v_new
        y_new = shift_right(y) + mu * u_new
        return u_new, v_new, x_new, y_new

    _, _, x, _ = jax.lax.fori_loop(0, n - 1, step, (u0, v0, x0, y0))
    out_ref[:] = x


def levinson_solve_fused(
    r0: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Solve T(r0) x = b, batched: r0, b (B, n) -> x (B, n), fp32.

    Bit-for-bit the same recursion as ops/toeplitz.py::levinson_solve (the
    two differ only in float reassociation of the reductions). n must be a
    lane multiple (128); B is padded to the fp32 sublane tile internally.
    """
    assert r0.ndim == 2 and b.shape == r0.shape
    batch, n = r0.shape
    assert n % 128 == 0, f"lane-multiple order required, got n={n}"

    r0 = r0.astype(jnp.float32)
    b = b.astype(jnp.float32)
    r_first = r0[:, :1]
    safe0 = jnp.where(jnp.abs(r_first) < 1e-30, 1.0, r_first)
    # normalized tail, shifted down one lane: r1[j] = r0[j+1]/r0[0], last 0
    r1 = jnp.pad(r0[:, 1:] / safe0, ((0, 0), (0, 1)))
    bn = b / safe0

    pad_b = (-batch) % 8
    if pad_b:
        r1 = jnp.pad(r1, ((0, pad_b), (0, 0)))
        bn = jnp.pad(bn, ((0, pad_b), (0, 0)))

    x = pl.pallas_call(
        functools.partial(_levinson_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct(r1.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(r1, bn)
    return x[:batch]
