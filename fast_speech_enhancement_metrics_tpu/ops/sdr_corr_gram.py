"""SDR correlations as time-domain Gram matmuls — all-MXU, one Pallas kernel.

The chunk-DFT kernel (ops/sdr_corr_fused.py) spends ~half its eval in six
spectral multiply+reduce products on the VPU (~1.8-2.0 ms/eval at batch 64
x 16 s; stage split in results/PROFILING.md). This kernel removes that VPU
stage entirely by computing the correlations in the time domain as Gram
matrices, which puts the lag reduction itself on the MXU.

Formulation (lag blocks of the lane width hb = 128): cut both signals into
hb-sample frames ``C[f, i] = c[hb f + i]`` (same for the lagged targets Y
in {C, D}); a lag ``l = hb a + b`` reaches frame ``f + a`` or ``f + a + 1``:

    r[hb a + b] = sum_f sum_i C[f, i] * Y[f + a + (i+b >= hb), (i+b) mod hb]

so with the shifted Grams  ``G_s[i, j] = sum_f C[f, i] Y[f + s, j]``
(s = 0..n_lags/hb, each an MXU matmul contracting the frame axis),

    r[hb a + b] = colsum_b( triu(G_a) + tril(G_{a+1}, -1)  row-rolled ),

i.e. per lag block: one select-merge, log2(hb) masked-roll steps on an
(hb, hb) tile, and a column sum. All shifted right operands ride ONE
matmul — the lane axis carries ``[C_0..C_4 | D_0..D_4]`` (N = 1280) — and
the left operand is shared by the auto and cross correlations, so the MXU
runs one (hb, F)x(F, 10 hb) contraction per frame block at full tile
shapes.

Why this beats both the DFT path and a 512-wide Gram variant (A/B in
tools/prof_gram_parts.py, chain-128 interleaved): the 128-wide lag blocks
compute a 1.25x-minimal product band (a single 512-wide Gram computes 2x),
and the roll epilogue acts on (128,128) tiles instead of (512,512) — the
512-wide variant measured 1.73 ms/eval with 0.48 ms of rolls; this one
0.82 ms/eval (x1) all-in.

Reference role: the auto/cross correlation behind SDR's Toeplitz normal
equations, fast_se_metrics/SDR.py:34-49 (computed there by full-length
FFTs). Agreement with ops/dft.py::correlation_lags is asserted in
tests/test_ops.py.

``split="x3"`` (default) matches the DFT kernel's bf16 hi/lo product class
(hi*hi + hi*lo + lo*hi, XLA Precision.HIGH): 1.9e-4 dB end-to-end vs the
fused-DFT path — inside the reference's own published 8e-4 GPU deviation.
``split="x1"`` halves the MXU passes for ~2e-3..1.3e-2 dB depending on
conditioning — measured AT the 1e-2 contract boundary on 16 s fixtures,
so it is an out-of-contract screening mode, never auto-selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(
    c1_ref,  # (1, FB, hb) clean frames, block j
    c2_ref,  # (1, FB, hb) clean frames, block j+1 (clamped at the last block)
    d1_ref,  # (1, FB, hb) denoised frames, block j
    d2_ref,  # (1, FB, hb) block j+1
    out_ref,  # (1, 2, n_lags) [r_auto; r_cross]
    g_ref,  # (hb, 2*(n_shifts+1)*hb) f32 scratch: [C_0..C_S | D_0..D_S] Grams
    *,
    hb: int,
    fb: int,
    f_total: int,
    n_shifts: int,  # n_lags // hb; shifted operands s = 0..n_shifts
    splits: int,
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (fb, hb), 0)
    f_idx = j * fb + rows  # global frame index of slab row r
    # tail blocks read past the (B, F, hb) array — mask with a select, NOT
    # a multiply (0 * out-of-bounds NaN = NaN). The masked blocks also make
    # every shifted operand's out-of-range frames zero after the rolls.
    valid = f_idx < f_total
    valid_next = f_idx + fb < f_total
    c_blk = jnp.where(valid, c1_ref[0], 0.0)
    d_blk = jnp.where(valid, d1_ref[0], 0.0)
    c_nxt = jnp.where(valid_next, c2_ref[0], 0.0)
    d_nxt = jnp.where(valid_next, d2_ref[0], 0.0)

    def shifts(x, nxt):
        # shift s: row r = frame j*fb + r + s — rows fb-s.. come from the
        # next block. roll(x, fb-s) puts x[(r+s) mod fb] at row r, so the
        # SAME roll of the next block supplies the boundary rows.
        outs = [x]
        for s in range(1, n_shifts + 1):
            rx = pltpu.roll(x, shift=fb - s, axis=0)
            rn = pltpu.roll(nxt, shift=fb - s, axis=0)
            outs.append(jnp.where(rows < fb - s, rx, rn))
        return outs

    b_op = jnp.concatenate(shifts(c_blk, c_nxt) + shifts(d_blk, d_nxt), axis=1)

    def hi_lo(x):
        xh = x.astype(jnp.bfloat16)
        return xh, (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)

    dims = (((0,), (0,)), ((), ()))
    if splits in (3, 4):
        ah, al = hi_lo(c_blk)
        bh, bl = hi_lo(b_op)
        if splits == 4:  # full product incl. lo*lo (bf16x6-equivalent class)
            a = jnp.concatenate([ah, ah, al, al], axis=0)
            b = jnp.concatenate([bh, bl, bh, bl], axis=0)
        else:  # x3: drop the lo*lo term (XLA Precision.HIGH class)
            a = jnp.concatenate([ah, ah, al], axis=0)
            b = jnp.concatenate([bh, bl, bh], axis=0)
        g_ref[:] += jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )
    else:
        g_ref[:] += jax.lax.dot_general(
            c_blk.astype(jnp.bfloat16),
            b_op.astype(jnp.bfloat16),
            dims,
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_j - 1)
    def _():
        g = g_ref[:]  # (hb, 2*(S+1)*hb)
        na = n_shifts  # lag blocks a = 0..na-1
        w = na * hb  # n_lags
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 0)
        l_idx = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 1) % hb
        # M_a = triu(G_a) + tril(G_{a+1}, -1) for each lag block a
        m_c = jnp.where(l_idx >= i_idx, g[:, :w], g[:, hb : w + hb])
        off = (na + 1) * hb
        m_d = jnp.where(
            l_idx >= i_idx, g[:, off : off + w], g[:, off + hb : off + w + hb]
        )

        # roll row i of every (hb, hb) lag-block tile left by i, so lag
        # hb*a + b lands in column b of tile a; log2(hb) masked static rolls
        i_col = jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 0)
        k, s = 0, 1
        while s < hb:
            bit = (i_col >> k) % 2 == 1
            mc_parts, md_parts = [], []
            for a in range(na):
                sl = slice(a * hb, (a + 1) * hb)
                mc_parts.append(
                    jnp.where(
                        bit, pltpu.roll(m_c[:, sl], shift=hb - s, axis=1), m_c[:, sl]
                    )
                )
                md_parts.append(
                    jnp.where(
                        bit, pltpu.roll(m_d[:, sl], shift=hb - s, axis=1), m_d[:, sl]
                    )
                )
            m_c = jnp.concatenate(mc_parts, axis=1)
            m_d = jnp.concatenate(md_parts, axis=1)
            k, s = k + 1, s * 2

        r_cc = jnp.sum(m_c, axis=0, keepdims=True)
        r_cd = jnp.sum(m_d, axis=0, keepdims=True)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (2, w), 0)
        out_ref[0] = jnp.where(rows2 == 0, r_cc, 0.0) + jnp.where(
            rows2 == 1, r_cd, 0.0
        )


@functools.partial(
    jax.jit, static_argnames=("n_lags", "frame_block", "split", "interpret")
)
def correlation_lags_gram(
    c: jnp.ndarray,
    d: jnp.ndarray,
    n_lags: int,
    frame_block: int = 512,
    split: str = "x3",
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Auto/cross correlations ``r[l] = sum_t c[t-l] * y[t]``, lags 0..n_lags-1.

    c, d: (B, T) fp32 -> (r_auto, r_cross), each (B, n_lags). Same values
    as ``correlation_lags(c, (c, d), n_lags)`` up to float reassociation;
    when ``T % 128 != 0`` the signals are zero-padded up to a frame
    multiple first (identical correlations — lags beyond the signal see
    zeros either way).
    """
    assert c.ndim == 2 and c.shape == d.shape
    hb = 128
    assert n_lags % hb == 0, f"lag count must be lane-aligned, got {n_lags}"
    assert split in ("x1", "x3", "x4")
    n_shifts = n_lags // hb
    batch, t = c.shape

    c = c.astype(jnp.float32)
    d = d.astype(jnp.float32)
    if t % hb:
        pad = hb - t % hb
        c = jnp.pad(c, ((0, 0), (0, pad)))
        d = jnp.pad(d, ((0, 0), (0, pad)))
        t += pad
    f_total = t // hb
    fb = frame_block
    assert fb % 8 == 0 and fb > n_shifts
    n_fb = -(-f_total // fb)

    cc = c.reshape(batch, f_total, hb)
    dc = d.reshape(batch, f_total, hb)

    spec1 = pl.BlockSpec(
        (1, fb, hb), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    spec2 = pl.BlockSpec(
        (1, fb, hb),
        lambda b, j: (b, jnp.minimum(j + 1, n_fb - 1), 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _gram_kernel,
            hb=hb,
            fb=fb,
            f_total=f_total,
            n_shifts=n_shifts,
            splits={"x1": 1, "x3": 3, "x4": 4}[split],
        ),
        grid=(batch, n_fb),
        in_specs=[spec1, spec2, spec1, spec2],
        out_specs=pl.BlockSpec(
            (1, 2, n_lags), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 2, n_lags), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hb, 2 * (n_shifts + 1) * hb), jnp.float32),
        ],
        interpret=interpret,
    )(cc, cc, dc, dc)
    return out[:, 0], out[:, 1]
