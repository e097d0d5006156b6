"""Fused SDR correlations as a single Pallas TPU kernel.

The XLA formulation (ops/dft.py::correlation_lags, the overlap-save
correlation behind SDR's Toeplitz normal equations — reference role:
fast_se_metrics/SDR.py:34-49) is HBM-bound around its matmuls: the clean
and denoised chunk spectra are (B, ~500, 2*(h+1))-float tensors (~130 MB
at batch 64, 16 s, h = 512) written by the chunk-DFT matmuls and re-read
by the window combine and the spectral products. On-chip stage timing put
the whole correlation stage at ~1.9 ms against a 1.04 ms MXU floor for
its 68 GFLOP of bf16x3 matmuls — the gap is exactly that spectrum traffic.

This kernel keeps every spectrum in VMEM. Per grid step (batch row b,
chunk-group j of CB chunks) it:

* runs the two chunk-DFT matmuls (clean block of CB+1 rows for the
  one-chunk window overlap, denoised block of CB rows) in bf16x3
  (hi/lo split, lo*lo dropped — XLA Precision.HIGH class),
* combines adjacent chunk spectra into window spectra with the (-1)^f
  phase factor (rows h..2h-1 of the 2h-point DFT matrix are (-1)^f times
  rows 0..h-1),
* reduces the auto (clean x clean) and cross (clean x denoised) spectral
  products over the group's windows,

and emits one (4, h+1) fp32 partial — auto re/im, cross re/im — so HBM
sees the raw chunks once and ~0.5 MB of partials instead of ~260 MB of
spectra. The tiny inverse DFT at the n_lags wanted points stays in XLA
(same `_inverse_lag_matrices` as the XLA path, so the two are bin-exact
apart from float reassociation of the block sums).

Padding windows need no masks: padded chunks are zero, and every
out-of-range window product carries at least one zero factor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_speech_enhancement_metrics_tpu.ops.dft import (
    _inverse_lag_matrices,
    _rdft_matrices,
)


def _corr_kernel(
    c1_ref,  # (1, CB, h) left-padded clean chunks, group j
    c2_ref,  # (1, CB, h) group j+1 (boundary row)
    d1_ref,  # (1, CB, h) denoised chunks, group j
    wh_ref,  # (h, 2*n_bins) packed cos|sin chunk-DFT matrix, bf16 hi
    wl_ref,  # (h, 2*n_bins) bf16 lo residual
    out_ref,  # (1, 1, 4, n_bins) partial spectra
    *,
    n_bins: int,
):
    def dot3(x):
        # bf16x3: hi/lo split of x against the pre-split DFT matrix
        dims = (((1,), (0,)), ((), ()))
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

        def mm(p, q):
            return jax.lax.dot_general(
                p, q, dims, preferred_element_type=jnp.float32
            )

        return mm(xh, wh_ref[:]) + (mm(xh, wl_ref[:]) + mm(xl, wh_ref[:]))

    c_blk = jnp.concatenate([c1_ref[0], c2_ref[0][:1]], axis=0)  # (CB+1, h)
    a_c = dot3(c_blk)  # (CB+1, 2*n_bins)
    a_d = dot3(d1_ref[0])  # (CB, 2*n_bins)

    # one sublane roll realigns the k+1 spectra to vreg offset 0 — direct
    # a_c[1:] slices would carry offset 1 and force a Mosaic relayout copy
    # at every mixed-offset elementwise op below
    cb = a_c.shape[0] - 1
    # pltpu.roll wants a non-negative shift: rolling by rows-1 == roll by -1
    a_n = pltpu.roll(a_c, shift=cb, axis=0)[:cb]  # rows 1..CB of a_c

    re_c, im_c = a_c[:cb, :n_bins], a_c[:cb, n_bins:]
    re_n, im_n = a_n[:, :n_bins], a_n[:, n_bins:]
    re_d, im_d = a_d[:, :n_bins], a_d[:, n_bins:]

    sign = 1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, (1, n_bins), 1) % 2
    ).astype(jnp.float32)
    # window spectrum: W_k = A_k + (-1)^f A_{k+1} over the left-padded chunks
    re_w = re_c + sign * re_n
    im_w = im_c + sign * im_n
    # autocorrelation's Y_k is chunk k+1 of the left-padded view (= the
    # unpadded clean block k); the spectra are already on hand
    re_y, im_y = re_n, im_n

    def acc(re_b, im_b):
        # S[f] = sum_k W_k[f] * conj(Y_k[f]) over this group's windows
        s_re = jnp.sum(re_w * re_b + im_w * im_b, axis=0, keepdims=True)
        s_im = jnp.sum(im_w * re_b - re_w * im_b, axis=0, keepdims=True)
        return s_re, s_im

    ar, ai = acc(re_y, im_y)
    cr, ci = acc(re_d, im_d)
    # Mosaic cannot sublane-concatenate rows carrying different vreg
    # offsets (the keepdims reductions land on distinct sublanes); build
    # the (4, n_bins) stack with broadcasts + masked adds instead
    rows = jax.lax.broadcasted_iota(jnp.int32, (4, n_bins), 0)
    out_ref[0, 0] = (
        jnp.where(rows == 0, ar, 0.0)
        + jnp.where(rows == 1, ai, 0.0)
        + jnp.where(rows == 2, cr, 0.0)
        + jnp.where(rows == 3, ci, 0.0)
    )


def correlation_lags_fused(
    c: jnp.ndarray,
    d: jnp.ndarray,
    n_lags: int,
    chunk_block: int = 128,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Auto/cross correlations ``r[l] = sum_t c[t-l] * y[t]``, lags 0..n_lags-1.

    c, d: (B, T) fp32 -> (r_auto, r_cross), each (B, n_lags). Same values as
    ``correlation_lags(c, (c, d), n_lags, precision="high")`` up to float
    reassociation of the block sums; agreement asserted in tests/test_ops.py.
    """
    assert c.ndim == 2 and c.shape == d.shape
    h = n_lags
    n_bins = h + 1
    batch, t = c.shape
    k_blocks = -(-t // h)
    nfb = -(-k_blocks // chunk_block)
    # the j+1 view of the clean chunks must exist: one extra all-zero group
    n_chunks = (nfb + 1) * chunk_block

    c = c.astype(jnp.float32)
    d = d.astype(jnp.float32)
    # window k of c spans c[h*k-h : h*k+h]: left-pad by h, then chunk
    cp = jnp.pad(c, ((0, 0), (h, n_chunks * h - t - h)))
    dp = jnp.pad(d, ((0, 0), (0, n_chunks * h - t)))
    cc = cp.reshape(batch, n_chunks, h)
    dc = dp.reshape(batch, n_chunks, h)

    cos, sin = _rdft_matrices(2 * h)
    w = np.concatenate([cos[:h], sin[:h]], axis=1)  # (h, 2*n_bins)
    wh = jnp.asarray(w.astype(np.float32)).astype(jnp.bfloat16)
    wl = (jnp.asarray(w) - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    spec1 = pl.BlockSpec(
        (1, chunk_block, h), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    spec2 = pl.BlockSpec(
        (1, chunk_block, h), lambda b, j: (b, j + 1, 0), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(w.shape, lambda b, j: (0, 0), memory_space=pltpu.VMEM)

    partials = pl.pallas_call(
        functools.partial(_corr_kernel, n_bins=n_bins),
        grid=(batch, nfb),
        in_specs=[spec1, spec2, spec1, wspec, wspec],
        out_specs=pl.BlockSpec(
            (1, 1, 4, n_bins), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, nfb, 4, n_bins), jnp.float32),
        interpret=interpret,
    )(cc, cc, dc, wh, wl)

    s = jnp.sum(partials, axis=1)  # (B, 4, n_bins)
    icos_np, isin_np = _inverse_lag_matrices(h, n_lags)
    icos, isin = jnp.asarray(icos_np), jnp.asarray(isin_np)

    def idft(s_re, s_im):
        return jnp.einsum(
            "bn,nl->bl", s_re, icos, precision="highest"
        ) - jnp.einsum("bn,nl->bl", s_im, isin, precision="highest")

    return idft(s[:, 0], s[:, 1]), idft(s[:, 2], s[:, 3])
