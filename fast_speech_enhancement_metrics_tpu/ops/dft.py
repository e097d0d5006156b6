"""MXU-native framed real DFT.

On TPU, XLA's FFT runs far from the hardware's speed of light for the
short framed transforms every metric here uses (measured on one v5e chip,
batch 64 x 16 s audio: a 512-point framed ``jnp.fft.rfft`` costs ~8 ms
while the same transform as an MXU matmul costs ~2.5-3 ms — and the
explicit framing step itself (~2 ms of copies) can be fused away
entirely). At n_fft = 512 a DFT-as-matmul is (frames, 512) @ (512, 514):
squarely in the systolic array's sweet spot, and XLA fuses the windowing
and magnitude epilogues for free.

Framing fusion: with hop h dividing n_fft = k*h, frame f is the
concatenation of hop-chunks [f, f+1, .., f+k-1] of the signal — so the
framed DFT ``frames @ W`` factors into a sum of k matmuls on *shifted
views* of the zero-copy (T//h, h) chunk reshape:

    Y[f] = sum_i chunks[f + i] @ W[i*h : (i+1)*h]

No (frames, n_fft) tensor is ever materialized; the window folds into the
rows of W at trace time.

The reference reaches the same spectra through ``torch.stft`` /
``torchaudio.Spectrogram`` on cuFFT (reference: fast_se_metrics/LSD.py:18-30,
STOI.py:49-69, PESQ.py:63-71); this module is the TPU-first re-design, not
a port. Numerics: the DFT matrix is built in float64 and applied at the
caller's matmul ``precision`` — "highest" keeps magnitudes within ~1e-6
relative of an FFT, well inside every metric's agreement contract.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.ops.stft import hann_window, num_frames


@functools.lru_cache(maxsize=None)
def _rdft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_fft, n_bins) cos / -sin matrices of the one-sided real DFT.

    Computed in float64, returned as float32: ``x @ cos`` is Re(rfft(x)),
    ``x @ sin`` is Im(rfft(x)).
    """
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * f / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _chunk_rdft_matrix(n_fft: int) -> np.ndarray:
    """(n_fft/2, 2*(n_fft/2+2)) packed cos|sin chunk-DFT matrix.

    Transforms a hop-sized chunk (hop = n_fft/2) at the n_fft-point DFT
    frequencies k = 0 .. n_fft/2+1 — one guard bin past one-sided so a
    frequency-domain Hann convolution has its k+1 neighbour available at
    the last kept bin. Consumed by the fused LSD kernel
    (``ops/lsd_fused.py``), where the shared-chunk factorization halves the
    MXU FLOPs of the 50 %-overlap framed DFT. (As a plain XLA rewrite the
    same factorization *loses*: it halves FLOPs but materializes two extra
    spectrum-sized intermediates, and the framed DFT is HBM-bound —
    measured 189k -> 153k audio-s/s on LSD. It only pays inside a kernel
    that keeps everything in VMEM.)
    """
    hop = n_fft // 2
    nb = n_fft // 2 + 2
    t = np.arange(hop, dtype=np.float64)[:, None]
    f = np.arange(nb, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * f / n_fft
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _windowed_rdft_matrices(
    n_fft: int, win_length: int | None, window_key: object
) -> tuple[np.ndarray, np.ndarray]:
    """DFT matrices with the analysis window folded into their rows."""
    cos, sin = _rdft_matrices(n_fft)
    if window_key is None:
        w = hann_window(win_length or n_fft).astype(np.float64)
        if len(w) < n_fft:  # torch.stft center-pads the window
            left = (n_fft - len(w)) // 2
            w = np.pad(w, (left, n_fft - len(w) - left))
    else:
        w = np.asarray(window_key, dtype=np.float64)
        assert w.shape == (n_fft,)
    return (cos * w[:, None]).astype(np.float32), (sin * w[:, None]).astype(
        np.float32
    )


def framed_rdft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = False,
    window: np.ndarray | None = None,
    precision: str = "highest",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed framed real DFT of (..., T) -> (re, im), each (..., F, n_bins).

    Same spectra as ``ops.stft.stft`` (torch.stft semantics, frames-major
    layout) but computed on the MXU with framing fused into the matmuls.
    Requires ``hop`` to divide ``n_fft`` (every metric here uses 50 % or
    25 % overlap); asserts otherwise.
    """
    assert n_fft % hop == 0, "framed_rdft requires hop | n_fft"
    window_key = None if window is None else tuple(np.asarray(window).tolist())
    cos, sin = _windowed_rdft_matrices(n_fft, win_length, window_key)

    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])

    t = x.shape[-1]
    f = num_frames(t, n_fft, hop)
    if f <= 0:
        shape = x.shape[:-1] + (0, n_fft // 2 + 1)
        return jnp.zeros(shape, x.dtype), jnp.zeros(shape, x.dtype)

    k = n_fft // hop
    n_chunks = f + k - 1
    usable = n_chunks * hop
    if usable > t:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, usable - t)])
    chunks = x[..., :usable].reshape(x.shape[:-1] + (n_chunks, hop))

    # cos|sin packed into ONE (hop, 2*n_bins) matmul per shift: at 512-pt
    # transforms the packed output (514 cols -> 640 MXU lanes, 80% full)
    # beats two 257-col matmuls (384 lanes each, 67%) and halves dispatches
    n_bins = n_fft // 2 + 1
    out = None
    for i in range(k):
        cos_i = cos[i * hop : (i + 1) * hop]
        sin_i = sin[i * hop : (i + 1) * hop]
        if not (cos_i.any() or sin_i.any()):
            # window is zero across this whole shift (e.g. STOI's 256-tap
            # window center-padded to n_fft=512: shifts 0 and 3) — the
            # matmul would multiply by a zero matrix
            continue
        part = chunks[..., i : i + f, :]
        w = jnp.asarray(np.concatenate([cos_i, sin_i], axis=1))
        o = jnp.einsum("...fh,hn->...fn", part, w, precision=precision)
        out = o if out is None else out + o
    if out is None:
        shape = x.shape[:-1] + (f, n_bins)
        return jnp.zeros(shape, x.dtype), jnp.zeros(shape, x.dtype)
    return out[..., :n_bins], out[..., n_bins:]


@functools.lru_cache(maxsize=None)
def _chunk_rdft_matrix_packed(n_fft: int) -> np.ndarray:
    """(n_fft/2, n_fft) packed cos|sin chunk-DFT matrix, exact lane tiles.

    Like ``_chunk_rdft_matrix`` but carrying only bins 0..n_fft/2-1 so the
    packed output is exactly ``n_fft`` columns (4x128 lanes at n_fft=512 —
    the 516-column variant pads to 640 lanes on the MXU, a 20% waste). The
    Nyquist bin is the alternating-sign chunk sum (VPU) and the guard bin
    k = n_fft/2+1 is conj(bin n_fft/2-1) by Hermitian symmetry; the fused
    LSD kernel (ops/lsd_fused.py) reconstructs both.
    """
    hop = n_fft // 2
    nb = n_fft // 2
    t = np.arange(hop, dtype=np.float64)[:, None]
    f = np.arange(nb, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * f / n_fft
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _split_window_chunk_matrices(
    n_fft: int, window_key: tuple, n_bins: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Packed windowed chunk-DFT matrix + combine constants for
    ``framed_rdft_center_half``.

    For a window supported on the middle half of the frame (taps
    [hop, 3*hop) with hop = n_fft/4 — STOI's 256-tap Hann center-padded to
    512), frame f is chunk_{f+1}·w_a at offset hop plus chunk_{f+2}·w_b at
    offset 2*hop, so the windowed frame spectrum is

        X_f[k] = B1_{f+1}[k]·e^{-i·pi·k/2} + B2_{f+2}[k]·(-1)^k

    with B1/B2 the DFTs of the w_a/w_b-windowed chunks. Returns the
    (hop, 4*n_bins) packed [w_a·cos | w_a·sin | w_b·cos | w_b·sin] matrix
    and the (n_bins,) combine constants (cos, sin of -pi*k/2, (-1)^k).

    ``n_bins`` may be below the one-sided count to trim never-consumed high
    bins out of the matmul (STOI's 1/3-octave bands stop at ~4.3 kHz, bin
    219 of 257 — the trim packs the matmul to exact 128-lane tiles).
    """
    hop = n_fft // 4
    w = np.asarray(window_key, dtype=np.float64)
    assert w.shape == (n_fft,)
    assert not (w[:hop].any() or w[3 * hop :].any()), (
        "window must be supported on the middle half of the frame"
    )
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * f / n_fft
    cos64, sin64 = np.cos(ang), np.sin(ang)
    wa = w[hop : 2 * hop, None]
    wb = w[2 * hop : 3 * hop, None]
    packed = np.concatenate(
        [
            wa * cos64[:hop],
            wa * sin64[:hop],
            wb * cos64[:hop],
            wb * sin64[:hop],
        ],
        axis=1,
    ).astype(np.float32)
    k = np.arange(n_bins, dtype=np.float64)
    cr = np.cos(-np.pi * k / 2).round().astype(np.float32)  # 1,0,-1,0,..
    ci = np.sin(-np.pi * k / 2).round().astype(np.float32)  # 0,-1,0,1,..
    s2 = ((-1.0) ** k).astype(np.float32)
    return packed, cr, ci, s2


def framed_rdft_center_half(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: np.ndarray,
    precision: str = "highest",
    n_bins: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Framed real DFT for windows supported on the frame's middle half.

    Same spectra as ``framed_rdft`` (verified to fp32 rounding in
    tests/test_stoi.py) at **half the MXU FLOPs**: each hop-chunk gets ONE
    (hop, 4*n_bins) windowed-DFT matmul shared by the two frames that
    contain it, and frame spectra are VPU phase-combines of adjacent chunk
    spectra. Built for STOI's 512-point / hop-128 STFT whose 256-tap Hann
    (reference: fast_se_metrics/STOI.py:24,49-69) is center-padded, making
    shifts 0 and 3 zero and shifts 1, 2 the two window halves.
    """
    assert n_fft == 4 * hop, "center-half factorization requires hop = n_fft/4"
    if n_bins is None:
        n_bins = n_fft // 2 + 1
    assert n_bins <= n_fft // 2 + 1
    window_key = tuple(np.asarray(window, dtype=np.float64).tolist())
    packed, cr, ci, s2 = _split_window_chunk_matrices(n_fft, window_key, n_bins)

    t = x.shape[-1]
    f = num_frames(t, n_fft, hop)
    if f <= 0:
        shape = x.shape[:-1] + (0, n_bins)
        return jnp.zeros(shape, x.dtype), jnp.zeros(shape, x.dtype)
    n_chunks = f + 2  # chunk indices 1 .. f+1 are consumed
    usable = (n_chunks + 1) * hop
    if usable > t:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, usable - t)])
    chunks = x[..., :usable].reshape(x.shape[:-1] + (n_chunks + 1, hop))

    b = jnp.einsum(
        "...ch,hn->...cn", chunks, jnp.asarray(packed), precision=precision
    )
    b1re = b[..., 1 : f + 1, 0 * n_bins : 1 * n_bins]
    b1im = b[..., 1 : f + 1, 1 * n_bins : 2 * n_bins]
    b2re = b[..., 2 : f + 2, 2 * n_bins : 3 * n_bins]
    b2im = b[..., 2 : f + 2, 3 * n_bins : 4 * n_bins]
    crj, cij, s2j = jnp.asarray(cr), jnp.asarray(ci), jnp.asarray(s2)
    re = b1re * crj - b1im * cij + s2j * b2re
    im = b1re * cij + b1im * crj + s2j * b2im
    return re, im


@functools.lru_cache(maxsize=None)
def _inverse_lag_matrices(h: int, n_lags: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_bins, n_lags) inverse-rDFT matrices of the overlap-save correlation.

    Inverse rDFT of a 2h-point spectrum evaluated only at the wanted points
    m = h - l: r[m] = (1/w) * sum_f alpha_f * (Re S cos(2 pi f m / w)
    - Im S sin(...)). Shared by the XLA path below and the fused Pallas
    kernel (ops/sdr_corr_fused.py) so the two stay bin-exact.
    """
    w = 2 * h
    n_bins = h + 1
    m_pts = (h - np.arange(n_lags, dtype=np.float64))[None, :]
    f_pts = np.arange(n_bins, dtype=np.float64)[:, None]
    alpha = np.where((f_pts == 0) | (f_pts == h), 1.0, 2.0) / w
    ang = 2.0 * np.pi * f_pts * m_pts / w
    return (
        (alpha * np.cos(ang)).astype(np.float32),
        (alpha * np.sin(ang)).astype(np.float32),
    )


def correlation_lags(
    c: jnp.ndarray,
    others: tuple[jnp.ndarray, ...],
    n_lags: int,
    precision: str = "highest",
) -> list[jnp.ndarray]:
    """Correlations ``b_y[l] = sum_t c[t-l] * y[t]`` for lags 0..n_lags-1.

    TPU-first overlap-save: instead of one giant power-of-two FFT over the
    whole signal (the reference's approach via ``torch.fft.rfft`` at
    2^ceil(log2(2T-1)) — reference: fast_se_metrics/SDR.py:34-49), the
    signals are cut into ``n_lags``-sized blocks whose 2*n_lags-point DFTs
    are MXU matmuls; the spectral products are summed over blocks *before*
    the (tiny) inverse DFT at the n_lags wanted points. Measured ~4x faster
    than the full-length FFT path on one v5e at 16 s / batch 64.

    ``c`` is the lagged signal; each ``y`` in ``others`` may be ``c`` itself
    (autocorrelation). All shapes (..., T); lags beyond the signal see zeros
    (identical to the reference's zero-padded linear correlation).
    """
    h = n_lags
    w = 2 * h
    n_bins = h + 1
    t = c.shape[-1]
    k_blocks = -(-t // h)
    pad_t = k_blocks * h - t

    pad_cfg = [(0, 0)] * (c.ndim - 1)
    # windows of c: [chunk_k, chunk_{k+1}] over chunks of the left-padded
    # signal, so window k spans c[h*k-h : h*k+h] — zero-copy chunk reshape
    cp = jnp.pad(c, pad_cfg + [(h, pad_t)])
    chunks = cp.reshape(c.shape[:-1] + (k_blocks + 1, h))

    cos, sin = _rdft_matrices(w)
    cos_lo = jnp.asarray(cos[:h])
    sin_lo = jnp.asarray(sin[:h])

    def mm(part, m):
        return jnp.einsum("...kh,hn->...kn", part, m, precision=precision)

    # Chunk spectra of the left-padded signal. Rows h..2h-1 of the w-point
    # DFT matrix are (-1)^f times rows 0..h-1 (cos(pi f + x) = (-1)^f cos x),
    # so the two-chunk window spectrum is a VPU combine of adjacent chunk
    # spectra — and the y = c chunk spectra below are these same arrays
    # shifted by one block: half the MXU FLOPs of the direct 4-matmul form.
    re_c = mm(chunks, cos_lo)
    im_c = mm(chunks, sin_lo)
    sign = jnp.asarray(
        (1.0 - 2.0 * (np.arange(n_bins) % 2)).astype(np.float32)
    )
    re_w = re_c[..., :-1, :] + sign * re_c[..., 1:, :]
    im_w = im_c[..., :-1, :] + sign * im_c[..., 1:, :]

    icos_np, isin_np = _inverse_lag_matrices(h, n_lags)
    icos = jnp.asarray(icos_np)
    isin = jnp.asarray(isin_np)

    out = []
    for y in others:
        if y is c:
            # blocks of c (right-padded) are chunks[1:] of the left-padded
            # view: the autocorrelation's y-spectra are already computed
            re_y, im_y = re_c[..., 1:, :], im_c[..., 1:, :]
        else:
            yp = jnp.pad(y, pad_cfg + [(0, pad_t)])
            yb = yp.reshape(y.shape[:-1] + (k_blocks, h))
            re_y = mm(yb, cos_lo)
            im_y = mm(yb, sin_lo)
        # S[f] = sum_k W_k[f] * conj(Y_k[f])
        s_re = jnp.sum(re_w * re_y + im_w * im_y, axis=-2)
        s_im = jnp.sum(im_w * re_y - re_w * im_y, axis=-2)
        r = jnp.einsum("...n,nl->...l", s_re, icos, precision=precision) - jnp.einsum(
            "...n,nl->...l", s_im, isin, precision=precision
        )
        out.append(r)
    return out


def framed_spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = False,
    power: float = 2.0,
    window: np.ndarray | None = None,
    precision: str = "highest",
) -> jnp.ndarray:
    """Magnitude (power=1) / power (power=2) spectrogram on the MXU.

    Drop-in for ``ops.stft.spectrogram`` wherever hop divides n_fft.
    """
    re, im = framed_rdft(
        x, n_fft, hop, win_length=win_length, center=center, window=window,
        precision=precision,
    )
    mag_sq = re * re + im * im
    if power == 2.0:
        return mag_sq
    if power == 1.0:
        return jnp.sqrt(mag_sq)
    return mag_sq ** (power / 2.0)
