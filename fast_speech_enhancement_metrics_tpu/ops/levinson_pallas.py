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

    batch = r1.shape[0]

    def make_step(m: int):
        """Recursion step on width-``m`` state slices.

        After step k every carry is supported on lanes <= k+1 and the step
        itself touches nothing past lane k+1, so while k <= m-2 the whole
        update is exact on the (B, m) prefix — lanes beyond m are zeros
        that would multiply into the reductions as zeros. Early phases
        therefore run on 1/4 .. 3/4 of the vregs (~40% less VPU work over
        the full recursion than the flat-width loop).
        """
        r1m = r1[:, :m]
        bnm = bn[:, :m]
        colm = jax.lax.broadcasted_iota(jnp.int32, (batch, m), 1)
        not_first = (colm != 0).astype(jnp.float32)

        def shift_right(a):
            # pltpu.roll keeps the result at vreg lane offset 0 — a pad+slice
            # shift leaves the array at offset 1 and every elementwise op
            # mixing it with offset-0 arrays forces a Mosaic relayout (the
            # same pathology ops/sdr_corr_fused.py documents); the wrapped
            # last lane is zeroed by the mask
            return pltpu.roll(a, shift=1, axis=1) * not_first

        def step(k, carry):
            u, v, x, y = carry
            ef = jnp.sum(r1m * v, axis=1, keepdims=True)
            # b[k+1] extraction and the <r1, y> dot share one fused reduce
            sel = (colm == k + 1).astype(jnp.float32)
            mu = jnp.sum(sel * bnm - r1m * y, axis=1, keepdims=True)
            denom = 1.0 - ef * ef
            denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            recip = 1.0 / denom
            g = shift_right(v)
            u_new = (u - ef * g) * recip
            v_new = (g - ef * u) * recip
            x_new = x + mu * v_new
            y_new = shift_right(y) + mu * u_new
            return u_new, v_new, x_new, y_new

        return step

    col0 = jax.lax.broadcasted_iota(jnp.int32, (batch, min(128, n)), 1)
    e0 = (col0 == 0).astype(jnp.float32)
    u = e0
    x = bn[:, : min(128, n)] * e0  # x starts as [b0, 0, ...]
    v, y = u, x

    # phase bounds: steps k = start..stop-1 run at width m (k <= m-2 keeps
    # every lane access inside the slice); widths grow by the 128-lane vreg
    # quantum since narrower slices occupy full vregs anyway
    start = 0
    for m in range(128, n + 1, 128):
        stop = min(m - 1, n - 1)
        if stop > start:
            pad = m - u.shape[1]
            if pad:
                u, v, x, y = (
                    jnp.pad(a, ((0, 0), (0, pad))) for a in (u, v, x, y)
                )
            u, v, x, y = jax.lax.fori_loop(
                start, stop, make_step(m), (u, v, x, y)
            )
            start = stop
    out_ref[:] = x


def _levinson_kernel_flat(r1_ref, bn_ref, out_ref, *, n: int, unroll: int = 1):
    """Flat-width recursion (no prefix phases) with roll-based shifts —
    isolates the phase savings in A/B probes; ``unroll`` feeds fori_loop."""
    r1 = r1_ref[:]
    bn = bn_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, r1.shape, 1)
    not_first = (col != 0).astype(jnp.float32)
    e0 = (col == 0).astype(jnp.float32)

    def shift_right(a):
        return pltpu.roll(a, shift=1, axis=1) * not_first

    def step(k, carry):
        u, v, x, y = carry
        ef = jnp.sum(r1 * v, axis=1, keepdims=True)
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

    u = e0
    x = bn * e0
    carry = (u, u, x, x)
    steps = n - 1
    if unroll > 1:  # manual unroll: Mosaic's fori_loop only takes unroll=1/full

        def step_u(q, carry):
            for i in range(unroll):
                carry = step(q * unroll + i, carry)
            return carry

        carry = jax.lax.fori_loop(0, steps // unroll, step_u, carry)
        for k in range(steps - steps % unroll, steps):
            carry = step(k, carry)
    else:
        carry = jax.lax.fori_loop(0, steps, step, carry)
    _, _, x, _ = carry
    out_ref[:] = x


def _levinson_kernel_double(r1_ref, bn_ref, out_ref, *, n: int):
    """Two Levinson steps per loop iteration with all reductions hoisted.

    The scalar kernel is latency-bound: each step's cross-lane reduce ->
    broadcast -> update chain costs ~3.5 us while its ~450 vector ops cost
    ~0.5 us (phasing, unrolling and MXU-reduce variants all measured ~1.8 ms
    — tools/prof_lev_variants.py). Algebraically expanding step k+1's
    reductions in terms of step k's state turns every reduction of a double
    step into a function of FIVE independent reductions of the current
    state (using <r1, S(a)> = <r2, a> with r2 the left-shifted r1), so the
    pair costs ONE reduce latency:

        ef1 = <r1,v>            mu1 = b[k+1] - <r1,y>
        ef2 = rho1*(<r2,v> - ef1*<r1,u>)
        mu2 = b[k+2] - <r2,y> - mu1*rho1*(<r1,u> - ef1*<r2,v>)

    and the two updates compose into ~16 vector FMAs on shift combinations
    (S(v), S^2(v), S(u), S^2(y)). Same recursion, different reassociation —
    agreement asserted against the XLA scan in tests/test_ops.py.
    """
    r1 = r1_ref[:]  # (B, n): normalized tail, lane n-1 zero
    bn = bn_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, r1.shape, 1)
    not_first = (col != 0).astype(jnp.float32)
    e0 = (col == 0).astype(jnp.float32)
    # r2[j] = r1[j+1] (left shift): <r1, S(a)> == <r2, a> exactly, since the
    # right-shift S zeroes lane 0 and r1's last lane is already zero
    r2 = pltpu.roll(r1, shift=n - 1, axis=1) * (
        (col != n - 1).astype(jnp.float32)
    )

    def shift_right(a):
        return pltpu.roll(a, shift=1, axis=1) * not_first

    def guard(d):
        return jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)

    def double_step(i, carry):
        u, v, x, y = carry
        k = 2 * i
        sel1 = (col == k + 1).astype(jnp.float32)
        sel2 = (col == k + 2).astype(jnp.float32)
        # five independent reductions — one reduce latency for both steps
        ef1 = jnp.sum(r1 * v, axis=1, keepdims=True)
        p = jnp.sum(r2 * v, axis=1, keepdims=True)
        uu = jnp.sum(r1 * u, axis=1, keepdims=True)
        mu1 = jnp.sum(sel1 * bn - r1 * y, axis=1, keepdims=True)
        q2 = jnp.sum(sel2 * bn - r2 * y, axis=1, keepdims=True)

        rho1 = 1.0 / guard(1.0 - ef1 * ef1)
        ef2 = rho1 * (p - ef1 * uu)
        rho2 = 1.0 / guard(1.0 - ef2 * ef2)
        mu2 = q2 - mu1 * rho1 * (uu - ef1 * p)

        sv = shift_right(v)
        ssv = shift_right(sv)
        su = shift_right(u)
        ssy = shift_right(shift_right(y))

        u1 = (u - ef1 * sv) * rho1
        v1 = (sv - ef1 * u) * rho1
        g2 = rho1 * (ssv - ef1 * su)
        u2 = (u1 - ef2 * g2) * rho2
        v2 = (g2 - ef2 * u1) * rho2
        x2 = x + mu1 * v1 + mu2 * v2
        su1 = rho1 * (su - ef1 * ssv)
        y2 = ssy + mu1 * su1 + mu2 * u2
        return u2, v2, x2, y2

    def single_step(k, carry):
        u, v, x, y = carry
        ef = jnp.sum(r1 * v, axis=1, keepdims=True)
        sel = (col == k + 1).astype(jnp.float32)
        mu = jnp.sum(sel * bn - r1 * y, axis=1, keepdims=True)
        recip = 1.0 / guard(1.0 - ef * ef)
        g = shift_right(v)
        u_new = (u - ef * g) * recip
        v_new = (g - ef * u) * recip
        x_new = x + mu * v_new
        y_new = shift_right(y) + mu * u_new
        return u_new, v_new, x_new, y_new

    u = e0
    x = bn * e0
    carry = (u, u, x, x)
    steps = n - 1
    carry = jax.lax.fori_loop(0, steps // 2, double_step, carry)
    for k in range(steps - steps % 2, steps):
        carry = single_step(k, carry)
    _, _, x, _ = carry
    out_ref[:] = x


def _levinson_kernel_dotreduce(r1_ref, bn_ref, out_ref, *, n: int):
    """Levinson recursion with the per-step lane reductions on the MXU.

    The VPU-reduce kernel above spends most of each step in two cross-lane
    reductions (<r1, v> and <r1, y>); here both come from ONE narrow matmul
    [v; y] @ r1^T per step, and the b[k+1] lane extraction is a carried
    left-roll of bn (lane 0 is always the wanted element — aligned slice,
    no relayout, no onehot reduce).
    """
    r1 = r1_ref[:]  # (B, n)
    bn = bn_ref[:]

    batch = r1.shape[0]

    def make_step(m: int):
        r1m = r1[:, :m]
        colm = jax.lax.broadcasted_iota(jnp.int32, (batch, m), 1)
        not_first = (colm != 0).astype(jnp.float32)

        def shift_right(a):
            return pltpu.roll(a, shift=1, axis=1) * not_first

        def step(k, carry):
            u, v, x, y, bnc = carry
            vy = jnp.concatenate([v, y], axis=0)  # (2B, m), 8-aligned
            s = jax.lax.dot_general(
                vy,
                r1m,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2B, B): column j = <r1[j], .>; diag picks the own-batch dot
            # extract the matched-batch entries: row i pairs with column
            # i % B — one masked row-reduce over B lanes
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            diag = jnp.sum(
                jnp.where(rows % batch == cols, s, 0.0), axis=1, keepdims=True
            )  # (2B, 1)
            ef = diag[:batch]
            ry = diag[batch:]
            mu = bnc[:, :1] - ry
            denom = 1.0 - ef * ef
            denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            recip = 1.0 / denom
            g = shift_right(v)
            u_new = (u - ef * g) * recip
            v_new = (g - ef * u) * recip
            x_new = x + mu * v_new
            y_new = shift_right(y) + mu * u_new
            return u_new, v_new, x_new, y_new, pltpu.roll(bnc, shift=n - 1, axis=1)

        return step

    col0 = jax.lax.broadcasted_iota(jnp.int32, (batch, min(128, n)), 1)
    e0 = (col0 == 0).astype(jnp.float32)
    u = e0
    x = bn[:, : min(128, n)] * e0
    v, y = u, x
    bnc = pltpu.roll(bn, shift=n - 1, axis=1)  # left-roll by 1: lane 0 = b[1]

    start = 0
    for m in range(128, n + 1, 128):
        stop = min(m - 1, n - 1)
        if stop > start:
            pad = m - u.shape[1]
            if pad:
                u, v, x, y = (
                    jnp.pad(a, ((0, 0), (0, pad))) for a in (u, v, x, y)
                )
            u, v, x, y, bnc = jax.lax.fori_loop(
                start, stop, make_step(m), (u, v, x, y, bnc)
            )
            start = stop
    out_ref[:] = x


def levinson_solve_fused(
    r0: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
    variant: str = "vpu",
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

    kernels = {
        "vpu": _levinson_kernel,
        "dotreduce": _levinson_kernel_dotreduce,
        "flat": _levinson_kernel_flat,
        "flat_u4": functools.partial(_levinson_kernel_flat, unroll=4),
        "flat_u8": functools.partial(_levinson_kernel_flat, unroll=8),
        "double": _levinson_kernel_double,
    }
    kernel = kernels[variant]
    x = pl.pallas_call(
        functools.partial(kernel, n=n),
        out_shape=jax.ShapeDtypeStruct(r1.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(r1, bn)
    return x[:batch]
