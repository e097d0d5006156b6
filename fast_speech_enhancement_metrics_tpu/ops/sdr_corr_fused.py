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

and emits one (8, h) fp32 partial so HBM sees the raw chunks once and
~1 MB of partials instead of ~260 MB of spectra. The tiny inverse DFT at
the n_lags wanted points stays in XLA (same `_inverse_lag_matrices` as the
XLA path, so the two are bin-exact apart from float reassociation).

Lane-exact packing (round 3): the 2h-point one-sided transform has h+1
bins; carrying them as [cos 0..h | sin 0..h] makes 2h+2 = 1026 columns,
which (a) pads the matmul from 8 to 9 lane tiles (+12% MXU) and (b) puts
the imag block at lane offset 513 — misaligned, so every elementwise op on
it forced a Mosaic relayout copy. The matrix is instead packed as
[cos 0..h-1 | cos_h | sin 1..h-1] = exactly 2h columns: the Nyquist bin's
cosine column (the alternating-sign sum) sits in the always-zero sin_0
slot. Both 512-column blocks are tile-aligned, the (-1)^f window combine
applies to the packed array in ONE op (bin j lives at col j mod h and
(-1)^0 = +1 matches the even Nyquist bin), and the packed spectral
products decompose per block:  P1 = reW*reY (bins 0..h-1 real products),
P2 = x2W*x2Y (col 0 = the Nyquist real product, cols 1.. = imag
products), Q = x2W*reY - reW*x2Y (cols 1.. = the imaginary products; col
0 is garbage and masked — bins 0 and h have zero imaginary parts).

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
    ws_ref,  # (3h, 2h) K-stacked [wh; wl; wh] packed DFT matrix, bf16
    out_ref,  # (1, 1, 8, h) partial products
    *,
    h: int,
):
    def dot3(x):
        # bf16x3: hi/lo split of x against the pre-split DFT matrix; the
        # three products stack into ONE K-tripled matmul (see
        # ops/lsd_fused.py::_dot_f32) — the weight operand arrives
        # pre-stacked as [wh; wl; wh]
        dims = (((1,), (0,)), ((), ()))
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        xs = jnp.concatenate([xh, xh, xl], axis=1)
        return jax.lax.dot_general(
            xs, ws_ref[:], dims, preferred_element_type=jnp.float32
        )

    c_blk = jnp.concatenate([c1_ref[0], c2_ref[0][:1]], axis=0)  # (CB+1, h)
    a_c = dot3(c_blk)  # (CB+1, 2h) packed spectra
    a_d = dot3(d1_ref[0])  # (CB, 2h)

    # one sublane roll realigns the k+1 spectra to vreg offset 0 — direct
    # a_c[1:] slices would carry offset 1 and force a Mosaic relayout copy
    # at every mixed-offset elementwise op below
    cb = a_c.shape[0] - 1
    a_n = pltpu.roll(a_c, shift=cb, axis=0)[:cb]  # rows 1..CB of a_c

    # (-1)^f window combine on the WHOLE packed array: col j carries bin
    # j mod h, and the Nyquist bin (col h) is even so its +1 matches j=0
    sign = 1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, (1, 2 * h), 1) % 2
    ).astype(jnp.float32)
    a_w = a_c[:cb] + sign * a_n  # window spectra, packed
    # autocorrelation's Y_k is chunk k+1 of the left-padded view (= the
    # unpadded clean block k); the spectra are already on hand
    a_y = a_n

    re_w, x2_w = a_w[:, :h], a_w[:, h:]

    def acc(a_b):
        re_b, x2_b = a_b[:, :h], a_b[:, h:]
        p1 = jnp.sum(re_w * re_b, axis=0, keepdims=True)
        p2 = jnp.sum(x2_w * x2_b, axis=0, keepdims=True)
        q = jnp.sum(x2_w * re_b - re_w * x2_b, axis=0, keepdims=True)
        return p1, p2, q

    ap1, ap2, aq = acc(a_y)
    cp1, cp2, cq = acc(a_d)
    # Mosaic cannot sublane-concatenate rows carrying different vreg
    # offsets (the keepdims reductions land on distinct sublanes); build
    # the (8, h) stack with broadcasts + masked adds instead
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, h), 0)
    out_ref[0, 0] = (
        jnp.where(rows == 0, ap1, 0.0)
        + jnp.where(rows == 1, ap2, 0.0)
        + jnp.where(rows == 2, aq, 0.0)
        + jnp.where(rows == 3, cp1, 0.0)
        + jnp.where(rows == 4, cp2, 0.0)
        + jnp.where(rows == 5, cq, 0.0)
    )


def _corr_kernel_raw(
    c0_ref,  # (1, CB, h) RAW clean chunks, group j-1 (its LAST row is the
    #          left window overlap; index clamped to 0 at the first group)
    c1_ref,  # (1, CB, h) RAW clean chunks, group j
    d1_ref,  # (1, CB, h) RAW denoised chunks, group j
    ws_ref,  # (3h, 2h) K-stacked [wh; wl; wh] packed DFT matrix, bf16
    out_ref,  # (1, 1, 8, h) partial products
    *,
    h: int,
    cb: int,
    k_total: int,
):
    """Zero-copy variant of ``_corr_kernel``: no left/right-padded copies.

    With left pad = h = one chunk row, padded chunk p is raw chunk p-1.
    Group j still handles windows k in [j*CB, (j+1)*CB): window k combines
    clean chunks k-1 and k, so the group's clean slab is raw rows
    [j*CB-1, j*CB+CB) — the previous group's last row plus this group's
    block — while the denoised rows align exactly (no boundary). Structure
    (two K-tripled matmuls, one realigning roll, six reduced products) is
    identical to ``_corr_kernel``; the only additions are the two
    ``where`` masks that zero rows outside [0, k_total) — the ragged tail
    group reads out-of-bounds garbage (masking must be a select, NOT a
    multiply: 0 * garbage-NaN = NaN), and the clamped row at j = 0 stands
    in for the zero left-pad chunk.
    """
    j = pl.program_id(1)

    def dot3(x):
        dims = (((1,), (0,)), ((), ()))
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        xs = jnp.concatenate([xh, xh, xl], axis=1)
        return jax.lax.dot_general(
            xs, ws_ref[:], dims, preferred_element_type=jnp.float32
        )

    rows = jax.lax.broadcasted_iota(jnp.int32, (cb + 1, h), 0)
    cidx = j * cb - 1 + rows  # clean chunk index of slab row r
    c_blk = jnp.where(
        (cidx >= 0) & (cidx < k_total),
        jnp.concatenate([c0_ref[0][-1:], c1_ref[0]], axis=0),
        0.0,
    )
    drows = jax.lax.broadcasted_iota(jnp.int32, (cb, h), 0)
    d_blk = jnp.where(j * cb + drows < k_total, d1_ref[0], 0.0)

    a_c = dot3(c_blk)  # (CB+1, 2h): spectra of clean chunks j*CB-1 ..
    a_d = dot3(d_blk)  # (CB, 2h)

    # rows 1..CB realigned to vreg offset 0 — direct a_c[1:] slices carry
    # offset 1 and force a Mosaic relayout at every mixed-offset op below
    a_n = pltpu.roll(a_c, shift=cb, axis=0)[:cb]

    sign = 1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, (1, 2 * h), 1) % 2
    ).astype(jnp.float32)
    # window k = j*CB + r: a_w[r] = a_c[k-1] + sign * a_c[k]
    a_w = a_c[:cb] + sign * a_n
    # autocorrelation's Y_k is clean chunk k = slab row r+1
    a_y = a_n

    re_w, x2_w = a_w[:, :h], a_w[:, h:]

    def acc(a_b):
        re_b, x2_b = a_b[:, :h], a_b[:, h:]
        p1 = jnp.sum(re_w * re_b, axis=0, keepdims=True)
        p2 = jnp.sum(x2_w * x2_b, axis=0, keepdims=True)
        q = jnp.sum(x2_w * re_b - re_w * x2_b, axis=0, keepdims=True)
        return p1, p2, q

    ap1, ap2, aq = acc(a_y)
    cp1, cp2, cq = acc(a_d)

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, h), 0)
    out_ref[0, 0] = (
        jnp.where(rows8 == 0, ap1, 0.0)
        + jnp.where(rows8 == 1, ap2, 0.0)
        + jnp.where(rows8 == 2, aq, 0.0)
        + jnp.where(rows8 == 3, cp1, 0.0)
        + jnp.where(rows8 == 4, cp2, 0.0)
        + jnp.where(rows8 == 5, cq, 0.0)
    )


@functools.lru_cache(maxsize=None)
def _packed_corr_matrix(h: int) -> np.ndarray:
    """(h, 2h) packed [cos 0..h-1 | cos_h | sin 1..h-1] chunk-DFT matrix."""
    cos, sin = _rdft_matrices(2 * h)  # (2h, h+1) each; rows h.. unused here
    return np.concatenate(
        [cos[:h, :h], cos[:h, h : h + 1], sin[:h, 1:h]], axis=1
    ).astype(np.float32)


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
    # the packed (-1)^f window combine reuses one sign vector across both
    # column blocks, which requires the Nyquist bin (col h, sign (-1)^h)
    # to be even — odd lag counts would silently negate every imaginary
    # spectral product
    assert n_lags % 2 == 0, f"fused correlations require even n_lags, got {n_lags}"
    h = n_lags
    batch, t = c.shape
    k_blocks = -(-t // h)

    c = c.astype(jnp.float32)
    d = d.astype(jnp.float32)

    w = _packed_corr_matrix(h)
    wh = jnp.asarray(w).astype(jnp.bfloat16)
    wl = (jnp.asarray(w) - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    ws = jnp.concatenate([wh, wl, wh], axis=0)  # (3h, 2h)
    wspec = pl.BlockSpec(ws.shape, lambda b, j: (0, 0), memory_space=pltpu.VMEM)

    if t % h == 0:
        # zero-copy path: HBM sees each raw signal exactly once — no
        # left-padded/right-padded (B, T) copies (~0.3 ms of round-trips
        # per batch-64 x 16 s eval). The window index shifts by one inside
        # the kernel and ragged tail rows are masked there.
        nfb = -(-k_blocks // chunk_block)
        cc = c.reshape(batch, k_blocks, h)
        dc = d.reshape(batch, k_blocks, h)
        spec1 = pl.BlockSpec(
            (1, chunk_block, h), lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        )
        spec0 = pl.BlockSpec(
            (1, chunk_block, h),
            lambda b, j: (b, jnp.maximum(j - 1, 0), 0),
            memory_space=pltpu.VMEM,
        )
        partials = pl.pallas_call(
            functools.partial(
                _corr_kernel_raw, h=h, cb=chunk_block, k_total=k_blocks
            ),
            grid=(batch, nfb),
            in_specs=[spec0, spec1, spec1, wspec],
            out_specs=pl.BlockSpec(
                (1, 1, 8, h), lambda b, j: (b, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, nfb, 8, h), jnp.float32),
            interpret=interpret,
        )(cc, cc, dc, ws)
    else:
        nfb = -(-k_blocks // chunk_block)
        # the j+1 view of the clean chunks must exist: one extra all-zero
        # group
        n_chunks = (nfb + 1) * chunk_block
        # window k of c spans c[h*k-h : h*k+h]: left-pad by h, then chunk
        cp = jnp.pad(c, ((0, 0), (h, n_chunks * h - t - h)))
        dp = jnp.pad(d, ((0, 0), (0, n_chunks * h - t)))
        cc = cp.reshape(batch, n_chunks, h)
        dc = dp.reshape(batch, n_chunks, h)

        spec1 = pl.BlockSpec(
            (1, chunk_block, h), lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        )
        spec2 = pl.BlockSpec(
            (1, chunk_block, h), lambda b, j: (b, j + 1, 0),
            memory_space=pltpu.VMEM,
        )
        partials = pl.pallas_call(
            functools.partial(_corr_kernel, h=h),
            grid=(batch, nfb),
            in_specs=[spec1, spec2, spec1, wspec],
            out_specs=pl.BlockSpec(
                (1, 1, 8, h), lambda b, j: (b, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, nfb, 8, h), jnp.float32),
            interpret=interpret,
        )(cc, cc, dc, ws)

    s = jnp.sum(partials, axis=1)  # (B, 8, h)

    def unpack(p1, p2, q):
        # bins 0..h: s_re = [P1[0], P1[1..h-1] + P2[1..h-1], P2[0]];
        # s_im = [0, Q[1..h-1], 0] (bins 0 and h are real)
        s_re = jnp.concatenate(
            [p1[:, :1], p1[:, 1:] + p2[:, 1:], p2[:, :1]], axis=1
        )
        zero = jnp.zeros_like(q[:, :1])
        s_im = jnp.concatenate([zero, q[:, 1:], zero], axis=1)
        return s_re, s_im

    icos_np, isin_np = _inverse_lag_matrices(h, n_lags)
    icos, isin = jnp.asarray(icos_np), jnp.asarray(isin_np)

    def idft(s_re, s_im):
        return jnp.einsum(
            "bn,nl->bl", s_re, icos, precision="highest"
        ) - jnp.einsum("bn,nl->bl", s_im, isin, precision="highest")

    return idft(*unpack(s[:, 0], s[:, 1], s[:, 2])), idft(
        *unpack(s[:, 3], s[:, 4], s[:, 5])
    )
