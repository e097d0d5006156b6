"""Fused LSD (log-spectral distance) as a single Pallas TPU kernel.

The XLA formulation (metrics/lsd.py ``_compute``) is HBM-bound: the framed
spectrogram of the clean/denoised pair is a (2B, ~1000, 514)-float tensor
(~0.5 GB at batch 64) written by the DFT matmuls and re-read by the
log-ratio chain. These kernels never materialize it — band magnitudes live
only in VMEM.

Shared structural ideas (reference semantics anchor: fast_se_metrics/LSD.py:18-52):

* **Shared-chunk DFT.** With hop = n_fft/2, frame f = [chunk_f | chunk_{f+1}]
  and the right half's n_fft-point phase shift is e^{-i*pi*k} = (-1)^k, so
  the unwindowed frame spectrum is X_f[k] = A_f[k] + (-1)^k A_{f+1}[k] with
  A_j the chunk DFT — ONE (hop x n_bins+1) matmul per chunk instead of the
  two per frame of the shift decomposition (ops/dft.py): half the MXU FLOPs.
* **Frequency-domain Hann.** The periodic Hann is the 3-tap kernel
  [-0.25, 0.5, -0.25] in the frequency domain, so windowing is the exact
  convolution Y[k] = 0.5 X[k] - 0.25 (X[k-1] + X[k+1]) on the VPU
  (X[-1] = conj(X[1]) by Hermitian symmetry of the real input).

Two kernels:

* **Whole-signal** (default for clips up to ~16 s): grid = (batch,); each
  step loads one pair's full (n_chunks, hop) arrays (~2 MB fp32 at 16 s)
  straight from the zero-copy chunk reshape and runs ONE M≈2*n_chunks
  chunk-DFT matmul per signal. No frame-block boundaries, no overlap
  copies. A stage-decomposition probe (tools/prof_lsd_r3b.py) showed the
  round-2 frame-blocked kernel spent 86% of its time in the DFT stage at
  ~25% MXU — six M=257 matmuls per grid step left the systolic array
  fill/drain-bound, and a halo-materializing rewrite lost its win to
  ~350 MB of extra HBM round-trips (tools/prof_lsd_pb.py).
* **Frame-blocked** (long-audio fallback): the round-2 kernel — grid
  (batch, frame-blocks), overlapping windows via two index-mapped views of
  the chunk array, boundary row stitched in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_speech_enhancement_metrics_tpu.ops.dft import _chunk_rdft_matrix_packed
from fast_speech_enhancement_metrics_tpu.ops.stft import num_frames

#: whole-signal kernel cutover (n_chunks; ~16.4 s of 16 kHz audio at hop
#: 256). Mosaic's scoped-VMEM accounting measured 17.53 MB at NC=1152
#: (compile error: limit 16 MB) and the bench's NC=1008 compiles and runs,
#: so the cutover sits just above the bench shape with ~2% headroom;
#: longer clips take the frame-blocked kernel (proven on chip at 80 s,
#: tests/test_long_audio.py).
MAX_WHOLESIG_CHUNKS = 1024


def _dot_f32(x, w, precision):
    dims = (((1,), (0,)), ((), ()))
    if precision == "default":
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dims,
            preferred_element_type=jnp.float32,
        )
    # bf16x3 (XLA's Precision.HIGH, which Mosaic doesn't lower directly):
    # hi/lo bf16 split, drop the lo*lo term. The three products stack into
    # ONE K-tripled matmul — [xh | xh | xl] @ [wh; wl; wh] — identical
    # FLOPs, one MXU dispatch, no fp32 add chain (measured ~3% over the
    # three-dot form, tools/prof_lsd_k768.py).
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    xs = jnp.concatenate([xh, xh, xl], axis=1)
    ws = jnp.concatenate([wh, wl, wh], axis=0)
    return jax.lax.dot_general(xs, ws, dims, preferred_element_type=jnp.float32)


def _hann_mag_sq(xre, xim, xnyq):
    """(F, nb) unwindowed frame spectra (+ real Nyquist column (F, 1)) ->
    windowed |X|^2 as (F, nb-2) interior bins and (F, 3) edge bins
    (bins 0, nb-1, nb).

    Periodic-Hann as an exact 3-tap frequency-domain convolution.
    Interior bins 1..nb-2 from the lane arrays; boundary bins use
    X[-1] = conj(X[1]) (so Yim[0] = 0), the real X[nb], and
    X[nb+1] = conj(X[nb-1]) (so Yim[nb] = 0).
    """
    yre_i = 0.5 * xre[:, 1:-1] - 0.25 * (xre[:, :-2] + xre[:, 2:])
    yim_i = 0.5 * xim[:, 1:-1] - 0.25 * (xim[:, :-2] + xim[:, 2:])
    m_int = yre_i * yre_i + yim_i * yim_i  # (F, nb-2): bins 1..nb-2
    y0 = 0.5 * xre[:, :1] - 0.5 * xre[:, 1:2]
    ylo_re = 0.5 * xre[:, -1:] - 0.25 * (xre[:, -2:-1] + xnyq)
    ylo_im = 0.5 * xim[:, -1:] - 0.25 * xim[:, -2:-1]
    ynyq = 0.5 * xnyq - 0.5 * xre[:, -1:]
    m_edge = jnp.concatenate(
        [y0 * y0, ylo_re * ylo_re + ylo_im * ylo_im, ynyq * ynyq],
        axis=1,
    )  # (F, 3): bins 0, nb-1, nb
    return m_int, m_edge


def _sign_lane(nb):
    return 1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1) % 2
    ).astype(jnp.float32)


def _chunk_nyquist(chunks):
    # chunk Nyquist bin (k = hop): real alternating-sign sum of samples
    alt = 1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, chunks.shape, 1) % 2
    ).astype(jnp.float32)
    return jnp.sum(chunks * alt, axis=1, keepdims=True)


def _windowed_mag_sq(a, chunks):
    """(F+1, 2nb) packed chunk spectra + (F+1, hop) chunks -> windowed |X|^2
    as (F, nb-2) interior bins and (F, 3) edge bins (bins 0, nb-1, nb)."""
    nb = a.shape[-1] // 2
    sign = _sign_lane(nb)
    are, aim = a[:, :nb], a[:, nb:]
    anyq = _chunk_nyquist(chunks)  # (F+1, 1)
    # unwindowed frame spectrum via the (-1)^k chunk combination;
    # (-1)^nb = +1 at the (even) Nyquist bin
    xre = are[:-1] + sign * are[1:]
    xim = aim[:-1] + sign * aim[1:]
    xnyq = anyq[:-1] + anyq[1:]  # X[nb], imaginary part exactly 0
    return _hann_mag_sq(xre, xim, xnyq)


def _sq_log_ratio(c_sq, d_sq, eps):
    d_mag = jnp.sqrt(d_sq) + eps
    log_ratio = jnp.log(c_sq / (d_mag * d_mag) + eps)
    return log_ratio * log_ratio


def _lsd_wholesig_kernel(c_ref, d_ref, w_ref, out_ref, *, n_frames, eps, precision):
    def mags(ref):
        chunks = ref[0]  # (NC, hop): rows n_frames+1.. are zero padding
        a = _dot_f32(chunks, w_ref[:], precision)
        span = n_frames + 1
        return _windowed_mag_sq(a[:span], chunks[:span])

    c_int, c_edge = mags(c_ref)
    d_int, d_edge = mags(d_ref)
    n_bins_total = c_int.shape[1] + 3  # n_fft/2 + 1 one-sided bins
    # keepdims: a (n_frames,) 1D intermediate trips a Mosaic relayout bug
    # ("non-singleton logical dimension is replicated ...") at this length
    frame_ms = (
        jnp.sum(_sq_log_ratio(c_int, d_int, eps), axis=1, keepdims=True)
        + jnp.sum(_sq_log_ratio(c_edge, d_edge, eps), axis=1, keepdims=True)
    ) / n_bins_total  # (n_frames, 1)
    # the (B, 128) output block has a constant index map so it stays
    # resident in VMEM; each step deposits its scalar on its own row
    # (narrow per-step blocks fail Mosaic's (8, 128) tiling check)
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[:] = out_ref[:] + jnp.where(
        rows == b, jnp.sum(jnp.sqrt(frame_ms)), 0.0
    )


def _lsd_wholesig(clean, denoised, n_fft, hop, eps, precision, interpret):
    batch, t = clean.shape
    pad = n_fft // 2  # center=True
    f = num_frames(t + n_fft, n_fft, hop)
    n_chunks = -(-(f + 1) // 8) * 8  # chunks 0..f consumed; 8-row aligned

    def prep(x):
        x = jnp.pad(x, ((0, 0), (pad, n_chunks * hop - t - pad)))
        return x.reshape(batch, n_chunks, hop)

    c = prep(clean.astype(jnp.float32))
    d = prep(denoised.astype(jnp.float32))
    w = jnp.asarray(_chunk_rdft_matrix_packed(n_fft))

    sig_spec = pl.BlockSpec(
        (1, n_chunks, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    sums = pl.pallas_call(
        functools.partial(
            _lsd_wholesig_kernel, n_frames=f, eps=eps, precision=precision
        ),
        grid=(batch,),
        in_specs=[
            sig_spec,
            sig_spec,
            pl.BlockSpec(w.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch, 128), lambda b: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        interpret=interpret,
    )(c, d, w)
    return sums[:, 0] / f


def _lsd_wholesig_raw_kernel(
    scale_ref, c_ref, d_ref, w_ref, out_ref, *, eps, precision,
    in_kernel_scale=False, rows=1,
):
    """Whole-signal kernel over RAW hop-aligned chunk rows (no padded copy).

    With center padding pad = n_fft/2 = hop, padded chunk row j is exactly
    raw row j-1 (row 0 and the post-signal row are zero), so the frame
    spectra split into an interior slab and two edge frames:

      X[0]   = sign * A[0]                    (left pad chunk is zero)
      X[j]   = A[j-1] + sign * A[j]           j = 1 .. NC-1
      X[NC]  = A[NC-1]                        (right pad chunk is zero)

    with A the raw-chunk DFT. The denoised projection scale is applied to
    the chunks in VMEM, so the (B, T) pad/scale copies that cost ~0.3 ms of
    HBM round-trips per batch-64 eval in the padded formulation never
    happen; HBM sees each signal exactly once.

    ``in_kernel_scale``: the least-squares projection scale
    sum(c*d)/(sum(d*d)+eps) is computed HERE from the resident chunk slabs
    instead of arriving via ``scale_ref`` — the XLA prep otherwise
    re-reads both full (B, T) signals just for two reductions (~0.25
    ms/eval at batch 64; round-4 floor decomposition put the whole kernel
    at 1.21 ms, tools/prof_lsd_floor.py).

    ``rows``: signal pairs per grid step. The DFT stage is NOT MAC-bound
    (round-5 measurement: a Cooley-Tukey factorization with HALF the MACs
    ran 1.9x SLOWER, tools/prof_lsd_ct.py) — it is bound by per-step
    dispatch and VMEM-traffic overheads, so batching R pairs into one
    (R*NC, hop) matmul amortizes them. Needs the raised VMEM cap.
    """
    b = pl.program_id(0)

    def mags(chunks, scale):
        # dot -> epilogue per SIGNAL: one signal's VPU epilogue overlaps the
        # next signal's MXU dot in Mosaic's schedule (a dots-first/
        # epilogues-later ordering measured ~25% slower end-to-end)
        if scale is not None:
            chunks = chunks * scale
        a = _dot_f32(chunks, w_ref[:], precision)  # (NC, 2nb)
        nb = a.shape[-1] // 2
        sign = _sign_lane(nb)
        are, aim = a[:, :nb], a[:, nb:]
        q = _chunk_nyquist(chunks)  # (NC, 1)
        # interior frames 1..NC-1
        m_int, m_edge = _hann_mag_sq(
            are[:-1] + sign * are[1:],
            aim[:-1] + sign * aim[1:],
            q[:-1] + q[1:],
        )
        # frames 0 and NC as a 2-row slab
        e_int, e_edge = _hann_mag_sq(
            jnp.concatenate([sign * are[:1], are[-1:]], axis=0),
            jnp.concatenate([sign * aim[:1], aim[-1:]], axis=0),
            jnp.concatenate([q[:1], q[-1:]], axis=0),
        )
        return (m_int, m_edge), (e_int, e_edge)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jnp.zeros_like(out_ref)
    out_rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    for r in range(rows):
        cc, dd = c_ref[r], d_ref[r]
        if in_kernel_scale:
            num = jnp.sum(cc * dd)
            den = jnp.sum(dd * dd)
            scale = num / (den + eps)
        else:
            scale = scale_ref[b * rows + r, 0]
        (ci, ce), (cei, cee) = mags(cc, None)
        (di, de), (dei, dee) = mags(dd, scale)
        n_bins_total = ci.shape[1] + 3  # n_fft/2 + 1 one-sided bins
        # keepdims: 1D intermediates trip a Mosaic relayout bug at this size
        frame_ms = (
            jnp.sum(_sq_log_ratio(ci, di, eps), axis=1, keepdims=True)
            + jnp.sum(_sq_log_ratio(ce, de, eps), axis=1, keepdims=True)
        ) / n_bins_total  # (NC-1, 1)
        edge_ms = (
            jnp.sum(_sq_log_ratio(cei, dei, eps), axis=1, keepdims=True)
            + jnp.sum(_sq_log_ratio(cee, dee, eps), axis=1, keepdims=True)
        ) / n_bins_total  # (2, 1)
        total = jnp.sum(jnp.sqrt(frame_ms)) + jnp.sum(jnp.sqrt(edge_ms))
        acc = acc + jnp.where(out_rows == b * rows + r, total, 0.0)
    out_ref[:] = out_ref[:] + acc


def _lsd_wholesig_raw(
    clean, denoised, scale, hop, eps, precision, interpret, rows_per_step=1,
):
    """Zero-copy whole-signal path: requires T % hop == 0 and an 8-aligned
    chunk count (both hold for the benchmark's even-second 16 kHz clips).
    ``scale="auto"`` computes the projection scale in-kernel.
    ``rows_per_step``: signal pairs batched into each grid step's DFT
    matmul (must divide the batch)."""
    batch, t = clean.shape
    nc = t // hop
    rows = rows_per_step
    assert batch % rows == 0

    c = clean.astype(jnp.float32).reshape(batch, nc, hop)
    d = denoised.astype(jnp.float32).reshape(batch, nc, hop)
    w = jnp.asarray(_chunk_rdft_matrix_packed(2 * hop))
    in_kernel = isinstance(scale, str) and scale == "auto"
    if in_kernel:
        scale = jnp.zeros((1, 1), jnp.float32)  # unused placeholder
    else:
        scale = scale.astype(jnp.float32).reshape(batch, 1)

    sig_spec = pl.BlockSpec(
        (rows, nc, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    sums = pl.pallas_call(
        functools.partial(
            _lsd_wholesig_raw_kernel, eps=eps, precision=precision,
            in_kernel_scale=in_kernel, rows=rows,
        ),
        grid=(batch // rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            sig_spec,
            sig_spec,
            pl.BlockSpec(w.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch, 128), lambda b: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        # rows_per_step > 1 exceeds the compiler's 16 MB scoped-VMEM default
        # (~8 MB of chunk spectra per pair); physical VMEM is far larger
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(scale, c, d, w)
    return sums[:, 0] / (nc + 1)


@functools.lru_cache(maxsize=None)
def _ct_constants():
    """Constants for the factorized (radix-2 DIF) one-sided real chunk DFT.

    The 512-point DFT of the zero-padded hop-chunk factorizes as three DIF
    folds (VPU adds + twiddle multiplies; level 1 absorbs the zero padding
    for free) followed by eight 64-point DFTs indexed br = j1+2j2+4j3 with
    DFT512(x)[8m + br] = DFT64(b_br)[m]. For REAL chunks only the one-sided
    bins k = 0..255 (m = 0..31 per branch) + the Nyquist bin (alternating
    chunk sum, VPU) are needed, and branch 0 (the all-even fold path) stays
    real — so the MXU stage is seven (NC, 128)@(128, 64) complex-branch
    matmuls + one (NC, 64)@(64, 64) real matmul per signal: 61.4k MACs vs
    the dense chunk-DFT's 131k. All seven complex branches share ONE
    matrix, so they run as a single stacked (7*NC, 128) matmul.
    Validated against np.fft in tools/proto_lsd_ct.py (test_lsd_real).

    Returns (tw, w0, wc): ``tw`` (8, 256) packs the twiddles
    [w1re, w1im, w2re|0, w2im|0, w3re|0, w3im|0, 0, 0]; ``w0`` (64, 64)
    maps a real branch to packed [Re(32) | Im(32)]; ``wc`` (128, 64) maps a
    packed [re(64) | im(64)] complex branch likewise.
    """
    tw = np.zeros((8, 256), dtype=np.float64)
    t1 = np.arange(256)
    tw[0] = np.cos(-2 * np.pi * t1 / 512)
    tw[1] = np.sin(-2 * np.pi * t1 / 512)
    t2 = np.arange(128)
    tw[2, :128] = np.cos(-2 * np.pi * t2 / 256)
    tw[3, :128] = np.sin(-2 * np.pi * t2 / 256)
    t3 = np.arange(64)
    tw[4, :64] = np.cos(-2 * np.pi * t3 / 128)
    tw[5, :64] = np.sin(-2 * np.pi * t3 / 128)
    ang = -2 * np.pi * np.outer(np.arange(64), np.arange(32)) / 64
    c, s = np.cos(ang), np.sin(ang)
    w0 = np.concatenate([c, s], axis=1)  # real in: Re = b@c, Im = b@s
    # complex in: Re = re@c - im@s, Im = re@s + im@c
    wc = np.block([[c, s], [-s, c]])
    return tw.astype(np.float32), w0.astype(np.float32), wc.astype(np.float32)


def _ct_branch_spectra(x, tw, w0, wc, precision):
    """(NC, 256) real chunk slab -> (list of 8 (NC, 64) packed one-sided
    branch spectra [Re(32)|Im(32)], (NC, 1) Nyquist column).

    Three DIF folds on the VPU (branch 0's path stays real), then one
    stacked matmul for the seven complex branches + one small real matmul.
    """
    w1re, w1im = tw[0:1, :], tw[1:2, :]
    w2re, w2im = tw[2:3, :128], tw[3:4, :128]
    w3re, w3im = tw[4:5, :64], tw[5:6, :64]

    # L1: b0 = x (real, no-op); b1 = x * w1 (real * complex)
    b1re, b1im = x * w1re, x * w1im

    # L2 on real b0: even stays real, odd twiddles to complex
    a, bb = x[:, :128], x[:, 128:]
    e00 = a + bb
    d0 = a - bb
    o01 = (d0 * w2re, d0 * w2im)
    # L2 on complex b1
    are, aim = b1re[:, :128], b1im[:, :128]
    bre, bim = b1re[:, 128:], b1im[:, 128:]
    e10 = (are + bre, aim + bim)
    dre, dim = are - bre, aim - bim
    o11 = (dre * w2re - dim * w2im, dre * w2im + dim * w2re)

    # L3: real e00 -> br0 (real), br4 (complex via w3 twiddle)
    a, bb = e00[:, :64], e00[:, 64:]
    br0 = a + bb
    d0 = a - bb
    br4 = (d0 * w3re, d0 * w3im)

    def l3c(v):
        vre, vim = v
        are, aim = vre[:, :64], vim[:, :64]
        bre, bim = vre[:, 64:], vim[:, 64:]
        dre, dim = are - bre, aim - bim
        return (are + bre, aim + bim), (
            dre * w3re - dim * w3im, dre * w3im + dim * w3re
        )

    br1, br5 = l3c(e10)
    br2, br6 = l3c(o01)
    br3, br7 = l3c(o11)

    # stage 2: stack the seven complex branches (same DFT-64 matrix) into
    # ONE (7*NC, 128) matmul — per-dot overhead measured comparable to the
    # matmul itself at these shapes (tools/prof_lsd_ct.py microbench).
    # The hi/lo split runs BEFORE the stack and as three separate dots:
    # the (7NC, 384) K-tripled bf16 concat of _dot_f32 blew the 16 MB
    # scoped-VMEM budget (measured 21.2 MB compile error at NC=1000)
    stacked = jnp.concatenate(
        [jnp.concatenate([vre, vim], axis=1)
         for (vre, vim) in (br1, br2, br3, br4, br5, br6, br7)],
        axis=0,
    )
    dims = (((1,), (0,)), ((), ()))
    if precision == "default":
        zs = jax.lax.dot_general(
            stacked.astype(jnp.bfloat16), wc.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    else:
        xh = stacked.astype(jnp.bfloat16)
        xl = (stacked - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        wh = wc.astype(jnp.bfloat16)
        wl = (wc - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        zs = (
            jax.lax.dot_general(xh, wh, dims, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xh, wl, dims, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xl, wh, dims, preferred_element_type=jnp.float32)
        )
    nc = x.shape[0]
    spectra = [_dot_f32(br0, w0, precision)] + [
        zs[i * nc : (i + 1) * nc] for i in range(7)
    ]  # indexed by br = 0..7
    return spectra, _chunk_nyquist(x)


def _ct_hann_mags(x, q):
    """8 packed branch frame-spectra slabs + Nyquist column (one signal) ->
    (8 windowed |Y|^2 slabs (F, 32), |Y_nyq|^2 (F, 1)).

    Cyclic frequency-domain Hann in the scrambled layout k = 8m + br:
    X[k±1] sits in branch br±1 at the same lane, except the two carries —
    (br 0, any m) reaches (br 7, m-1) [a packed roll; its only wrong lanes
    are bin k=0's, overridden by the X[-1] = conj(X[1]) edge rule] and
    (br 7, m 31) reaches the Nyquist bin. Derived + tested in
    tools/proto_lsd_ct.py::lsd_ct_real.
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, x[0].shape, 1)
    # conj in packed [re|im] layout: negate the im half
    half_sign = jnp.where(lanes < 32, 1.0, -1.0)
    msq = []
    for b in range(8):
        if b >= 1:
            xm1 = x[b - 1]
        else:
            # (br0, m) - 1 = (br7, m-1): packed roll by 1; lanes 0 and
            # 32 (bin k=0) instead take conj(X[1]) = X[-1]
            r = pltpu.roll(x[7], 1, axis=1)
            xm1 = jnp.where((lanes == 0) | (lanes == 32), half_sign * x[1], r)
        if b <= 6:
            xp1 = x[b + 1]
        else:
            # (br7, m) + 1 = (br0, m+1): packed roll by -1; lanes 31
            # and 63 (bin k=255) instead take X[256] (real Nyquist)
            r = pltpu.roll(x[0], 63, axis=1)
            xp1 = jnp.where(lanes == 31, q, jnp.where(lanes == 63, 0.0, r))
        y = 0.5 * x[b] - 0.25 * (xm1 + xp1)
        msq.append(y[:, :32] ** 2 + y[:, 32:] ** 2)
    ynyq = 0.5 * q - 0.5 * x[7][:, 31:32]  # bin 256: X[257] = conj X[255]
    return msq, ynyq * ynyq


def _ct_signal_mags(x, scale, tw, w0, wc, precision):
    """(NC, 256) raw chunk slab -> windowed power spectra of all NC+1
    centered frames, as (8 interior slabs (NC-1, 32), interior Nyquist,
    8 edge slabs (2, 32), edge Nyquist). Runs the signal's whole pipeline
    (folds, stage-2 matmuls, frame combine, Hann) so every intermediate is
    dead before the second signal starts — the two-signal-interleaved
    version measured 21.2 MB of scoped VMEM vs the 16 MB budget."""
    if scale is not None:
        x = x * scale
    z, q = _ct_branch_spectra(x, tw, w0, wc, precision)
    # frame combine X_f[k] = Z_{f-1}[k] + (-1)^k Z_f[k], (-1)^k = (-1)^br;
    # interior frames 1..NC-1 as one slab, frames 0 and NC as a 2-row slab
    inner, edge = [], []
    for br, zb in enumerate(z):
        s = 1.0 if br % 2 == 0 else -1.0
        inner.append(zb[:-1] + s * zb[1:])
        edge.append(jnp.concatenate([s * zb[:1], zb[-1:]], axis=0))
    qi = q[:-1] + q[1:]  # (-1)^256 = +1
    qe = jnp.concatenate([q[:1], q[-1:]], axis=0)
    mi, mni = _ct_hann_mags(inner, qi)
    me, mne = _ct_hann_mags(edge, qe)
    return mi, mni, me, mne


def _ct_ratio_rows(c_msq, cn, d_msq, dn, eps):
    """Per-frame mean over the 257 one-sided bins of the squared log ratio."""
    total = None
    for b in range(8):
        part = jnp.sum(
            _sq_log_ratio(c_msq[b], d_msq[b], eps), axis=1, keepdims=True
        )
        total = part if total is None else total + part
    total = total + _sq_log_ratio(cn, dn, eps)
    return total / 257.0  # n_fft/2 + 1 one-sided bins


def _lsd_wholesig_ct_kernel(
    scale_ref, c_ref, d_ref, tw_ref, w0_ref, wc_ref, out_ref, *, eps,
    precision, in_kernel_scale=False,
):
    """Whole-signal raw-chunk kernel with the factorized (radix-2 DIF)
    one-sided real chunk DFT — same semantics as
    ``_lsd_wholesig_raw_kernel`` at half the nominal DFT MACs.
    """
    b = pl.program_id(0)
    cc = c_ref[0]  # (NC, hop) raw rows
    dd = d_ref[0]
    if in_kernel_scale:
        num = jnp.sum(cc * dd)
        den = jnp.sum(dd * dd)
        scale = num / (den + eps)
    else:
        scale = scale_ref[b, 0]
    tw, w0, wc = tw_ref[:], w0_ref[:], wc_ref[:]
    ci, cni, ce, cne = _ct_signal_mags(cc, None, tw, w0, wc, precision)
    di, dni, de, dne = _ct_signal_mags(dd, scale, tw, w0, wc, precision)

    frame_ms = _ct_ratio_rows(ci, cni, di, dni, eps)  # (NC-1, 1)
    edge_ms = _ct_ratio_rows(ce, cne, de, dne, eps)  # (2, 1)
    total = jnp.sum(jnp.sqrt(frame_ms)) + jnp.sum(jnp.sqrt(edge_ms))

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    out_ref[:] = out_ref[:] + jnp.where(rows == b, total, 0.0)


def _lsd_wholesig_ct(clean, denoised, scale, hop, eps, precision, interpret):
    """Factorized-DFT whole-signal path (same contract as
    ``_lsd_wholesig_raw``: T % hop == 0, 8-aligned chunk count)."""
    batch, t = clean.shape
    nc = t // hop
    assert hop == 256, "factorized chunk DFT is built for n_fft=512/hop=256"

    c = clean.astype(jnp.float32).reshape(batch, nc, hop)
    d = denoised.astype(jnp.float32).reshape(batch, nc, hop)
    tw_np, w0_np, wc_np = _ct_constants()
    tw = jnp.asarray(tw_np)
    w0 = jnp.asarray(w0_np)
    wc = jnp.asarray(wc_np)
    in_kernel = isinstance(scale, str) and scale == "auto"
    if in_kernel:
        scale = jnp.zeros((1, 1), jnp.float32)
    else:
        scale = scale.astype(jnp.float32).reshape(batch, 1)

    sig_spec = pl.BlockSpec(
        (1, nc, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    sums = pl.pallas_call(
        functools.partial(
            _lsd_wholesig_ct_kernel, eps=eps, precision=precision,
            in_kernel_scale=in_kernel,
        ),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            sig_spec,
            sig_spec,
            pl.BlockSpec(tw.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w0.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wc.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch, 128), lambda b: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        # the fold tree + stacked stage-2 operands measure ~23 MB of scoped
        # VMEM at the bench's NC=1000 — over the compiler's 16 MB default
        # but a fraction of the chip's physical VMEM (v5e: 128 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(scale, c, d, tw, w0, wc)
    return sums[:, 0] / (nc + 1)


def _lsd_framed_kernel(
    c1_ref,  # (1, FB, hop) clean chunks of block j
    c2_ref,  # (1, FB, hop) clean chunks of block j+1 (boundary row)
    d1_ref,  # (1, FB, hop) denoised chunks, block j
    d2_ref,  # (1, FB, hop) denoised chunks, block j+1
    w_ref,  # (hop, n_fft) packed cos|sin chunk-DFT matrix, bins 0..n_fft/2-1
    out_ref,  # (B, NFB) accumulator: per-(batch, block) frame sums
    *,
    frame_block: int,
    n_frames: int,
    eps: float,
    precision,
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    def windowed(b1, b2):
        # chunk DFT: rows j*FB .. j*FB+FB -> (FB+1, 2*nb), bins 0..nb-1
        chunks = jnp.concatenate([b1[0], b2[0][:1]], axis=0)
        a = _dot_f32(chunks, w_ref[:], precision)
        return _windowed_mag_sq(a, chunks)

    c_int, c_edge = windowed(c1_ref, c2_ref)
    d_int, d_edge = windowed(d1_ref, d2_ref)

    n_bins_total = c_int.shape[1] + 3  # n_fft/2 + 1 one-sided bins
    frame_ms = (
        jnp.sum(_sq_log_ratio(c_int, d_int, eps), axis=1)
        + jnp.sum(_sq_log_ratio(c_edge, d_edge, eps), axis=1)
    ) / n_bins_total  # (FB,)

    frame_idx = j * frame_block + jax.lax.broadcasted_iota(
        jnp.int32, (1, frame_block), 1
    )
    valid = (frame_idx < n_frames)[0]
    part = jnp.sum(jnp.where(valid, jnp.sqrt(frame_ms), 0.0))

    # the output block is the whole (B, NFB) array with a constant index
    # map, so it stays resident in VMEM across every grid step (scalar
    # (1,1) blocks fail Mosaic's (8,128) tiling check) — accumulate this
    # step's scalar through a coordinate mask
    @pl.when((b == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = out_ref[:] + jnp.where((rows == b) & (cols == j), part, 0.0)


def _lsd_framed(
    clean, denoised, n_fft, hop, eps, frame_block, precision, interpret
):
    batch, t = clean.shape
    pad = n_fft // 2  # center=True
    f = num_frames(t + n_fft, n_fft, hop)
    nfb = pl.cdiv(f, frame_block)
    # block j+1 of the second view must exist: one extra all-zero block
    n_chunks = (nfb + 1) * frame_block

    def prep(x):
        x = jnp.pad(x, ((0, 0), (pad, n_chunks * hop - t - pad)))
        return x.reshape(batch, n_chunks, hop)

    c = prep(clean.astype(jnp.float32))
    d = prep(denoised.astype(jnp.float32))
    w = jnp.asarray(_chunk_rdft_matrix_packed(n_fft))

    wspec = pl.BlockSpec(w.shape, lambda b, j: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (batch, nfb), lambda b, j: (0, 0), memory_space=pltpu.VMEM
    )
    spec1 = pl.BlockSpec(
        (1, frame_block, hop), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    spec2 = pl.BlockSpec(
        (1, frame_block, hop), lambda b, j: (b, j + 1, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _lsd_framed_kernel,
        frame_block=frame_block,
        n_frames=f,
        eps=eps,
        precision=precision,
    )
    partials = pl.pallas_call(
        kernel,
        grid=(batch, nfb),
        in_specs=[spec1, spec2, spec1, spec2, wspec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, nfb), jnp.float32),
        interpret=interpret,
    )(c, c, d, d, w)
    return jnp.sum(partials, axis=1) / f


def lsd_scores(
    clean: jnp.ndarray,
    denoised: jnp.ndarray,
    n_fft: int,
    hop: int,
    eps: float,
    frame_block: int = 256,
    precision: str = "high",
    interpret: bool = False,
    denoised_scale: jnp.ndarray | None = None,
    dft_impl: str = "dense",
    rows_per_step: int | str = "auto",
) -> jnp.ndarray:
    """Centered-STFT LSD of (B, T) pairs -> (B,) scores, fully fused.

    ``denoised`` must carry the least-squares projection scale — either
    pre-multiplied by the caller, or passed as ``denoised_scale`` ((B,) or
    (B, 1)), in which case hop-aligned inputs take a zero-copy path that
    applies the scale in VMEM and never materializes the padded/scaled
    (B, T) copies. Matches the XLA path's semantics bin-for-bin; agreement
    asserted in tests/test_lsd.py.
    """
    assert n_fft == 2 * hop, "fused LSD requires 50% overlap"
    t = clean.shape[1]
    f = num_frames(t + n_fft, n_fft, hop)
    if denoised_scale is not None:
        auto = isinstance(denoised_scale, str) and denoised_scale == "auto"
        nc = t // hop
        if t % hop == 0 and nc % 8 == 0 and f + 1 <= MAX_WHOLESIG_CHUNKS:
            if dft_impl == "ct" and n_fft == 512:
                return _lsd_wholesig_ct(
                    clean, denoised, denoised_scale, hop, eps, precision,
                    interpret,
                )
            if rows_per_step == "auto":
                # measured flat at r2 and ~9% SLOWER at r4/r8 on chip
                # (tools/prof_lsd_ct.py round-5 sweep): per-step dispatch
                # is NOT what the DFT stage is bound by — stay at 1
                rows_per_step = 1
            if clean.shape[0] % rows_per_step:
                rows_per_step = 1
            return _lsd_wholesig_raw(
                clean, denoised, denoised_scale, hop, eps, precision,
                interpret, rows_per_step=rows_per_step,
            )
        if auto:
            denoised_scale = jnp.sum(clean * denoised, axis=1) / (
                jnp.sum(denoised * denoised, axis=1) + eps
            )
        denoised = denoised * denoised_scale.reshape(-1, 1)
    if f + 1 <= MAX_WHOLESIG_CHUNKS:
        return _lsd_wholesig(
            clean, denoised, n_fft, hop, eps, precision, interpret
        )
    return _lsd_framed(
        clean, denoised, n_fft, hop, eps, frame_block, precision, interpret
    )
