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
