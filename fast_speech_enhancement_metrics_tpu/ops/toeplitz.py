"""Symmetric Toeplitz least-squares solve on TPU.

Builds the full (n, n) Toeplitz matrix from its first row by a static gather
(|i-j| indexing) and solves via batched Cholesky + two triangular solves —
both native XLA ops that run well on TPU. A NaN-guard reproduces the
reference's "fall back to a general solver if Cholesky fails" behavior
(reference: fast_se_metrics/SDR.py:7-31) without host-side exceptions: if any
batch element's Cholesky produced NaNs, that element is recomputed with a
general LU solve inside the same jitted graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def levinson_solve(r0: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve T(r0) x = b by batched Levinson-Durbin, static shapes only.

    TPU-first design: the classic recursion is re-parametrized so every step
    is expressible without dynamic-length slices or reversals — alongside
    the forward vector ``u`` (order n) we carry its reversal ``v`` and the
    reversal ``y`` of the running solution ``x``:

        ef    = <r[1:], v>          ex  = <r[1:], y>      (static dots;
        g     = shift_right(v)                             v, y vanish
        u'    = (u - ef*g) / (1 - ef^2)                    beyond order n)
        v'    = (g - ef*u) / (1 - ef^2)
        x'    = x + (b[n] - ex) * v'
        y'    = shift_right(y) + (b[n] - ex) * u'

    The whole solve is one ``lax.scan`` of cheap fused elementwise/reduce
    ops on (B, n) blocks — O(n^2) work but none of the sequential panel
    latency that makes batched Cholesky+triangular solves ~6x slower on
    TPU for n = 512. fp32 accuracy on the SDR systems: ~1e-4 dB (vs the
    1e-2 tolerance; see tools/proto_levinson.py). Replaces the role of
    ``torch.linalg.cholesky`` in the reference (fast_se_metrics/SDR.py:7-31).
    """
    n = r0.shape[-1]
    batch_shape = r0.shape[:-1]
    r_first = r0[..., :1]
    # guard zero leading autocorrelation (all-zero signal): identity system
    safe0 = jnp.where(jnp.abs(r_first) < 1e-30, 1.0, r_first)
    r1 = r0[..., 1:] / safe0  # normalized tail, (..., n-1)
    bn = b / safe0

    inv0 = jnp.ones_like(r_first)
    u0 = jnp.pad(inv0, [(0, 0)] * len(batch_shape) + [(0, n - 1)])
    x0 = jnp.pad(bn[..., :1], [(0, 0)] * len(batch_shape) + [(0, n - 1)])
    # v/y are maintained over the *tail* coordinate (support j < order)
    v0, y0 = u0, x0

    # step index enters via the scanned rhs element b[n]
    b_steps = jnp.moveaxis(bn[..., 1:], -1, 0)  # (n-1, ...)

    def shift_right(a):
        return jnp.pad(a, [(0, 0)] * len(batch_shape) + [(1, 0)])[..., :-1]

    def step(carry, b_k):
        u, v, x, y = carry
        ef = jnp.sum(r1 * v[..., : n - 1], axis=-1, keepdims=True)
        ex = jnp.sum(r1 * y[..., : n - 1], axis=-1, keepdims=True)
        denom = 1.0 - ef * ef
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        g = shift_right(v)
        u_new = (u - ef * g) / denom
        v_new = (g - ef * u) / denom
        mu = b_k[..., None] - ex
        x_new = x + mu * v_new
        y_new = shift_right(y) + mu * u_new
        return (u_new, v_new, x_new, y_new), None

    # unroll: each of the 511 steps is a handful of small (B, n) fused ops,
    # so per-iteration fixed overhead dominates; unrolling lets XLA fuse
    # across steps (measured on-chip — see tools/prof_sdr_r2.py)
    (u, v, x, y), _ = jax.lax.scan(
        step, (u0, v0, x0, y0), b_steps, unroll=8
    )
    return x


def symmetric_toeplitz_solve(r0: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve T(r0) x = b for batched first rows r0: (..., n), b: (..., n)."""
    n = r0.shape[-1]
    idx = np.abs(np.arange(n)[None, :] - np.arange(n)[:, None])
    r_matrix = r0[..., idx]  # (..., n, n)

    chol = jnp.linalg.cholesky(r_matrix)
    y = jax.scipy.linalg.solve_triangular(chol, b[..., None], lower=True)
    sol = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False
    )[..., 0]

    bad = jnp.any(jnp.isnan(sol), axis=-1, keepdims=True)

    def general(_):
        return jnp.linalg.solve(r_matrix, b[..., None])[..., 0]

    def keep(_):
        return sol

    fallback = jax.lax.cond(jnp.any(bad), general, keep, operand=None)
    return jnp.where(bad, fallback, sol)
