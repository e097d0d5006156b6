"""Float64 NumPy DSP primitives for the test oracles.

These deliberately use a *different* numerical path from the JAX package
(numpy float64, scipy.signal filters, direct strided framing) so agreement
tests exercise independent implementations, in the spirit of the reference's
agreement tests against external libraries (reference: tests/reference/*).
"""

from __future__ import annotations

import numpy as np


def hann(win_length: int, periodic: bool = True) -> np.ndarray:
    n = win_length if periodic else win_length - 1
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / n))


def frame(x: np.ndarray, frame_length: int, hop: int) -> np.ndarray:
    """(..., T) -> (..., F, frame_length) via stride tricks."""
    t = x.shape[-1]
    f = 1 + (t - frame_length) // hop if t >= frame_length else 0
    shape = x.shape[:-1] + (f, frame_length)
    strides = x.strides[:-1] + (hop * x.strides[-1], x.strides[-1])
    return np.lib.stride_tricks.as_strided(x, shape, strides).copy()


def stft(
    x: np.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = False,
) -> np.ndarray:
    """torch.stft-compatible (constant pad mode), frames-major layout."""
    win_length = win_length or n_fft
    w = hann(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    if center:
        pad = n_fft // 2
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    frames = frame(x.astype(np.float64), n_fft, hop) * w
    return np.fft.rfft(frames, axis=-1)


def sinc_resample(x: np.ndarray, orig_freq: int, new_freq: int,
                  lowpass_filter_width: int = 6, rolloff: float = 0.99) -> np.ndarray:
    """Float64 polyphase windowed-sinc resample (same algorithm family as
    torchaudio sinc_interp_hann), via direct per-phase convolution."""
    import math

    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig
    phase = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new
    t = np.clip((phase + idx[None]) * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    tp = t * np.pi
    kern = np.where(tp == 0, 1.0, np.sin(tp) / np.where(tp == 0, 1.0, tp)) * window
    kern *= base_freq / orig

    tlen = x.shape[-1]
    target = int(np.ceil(new * tlen / orig))
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(width, width + orig)])
    k = kern.shape[1]
    f = 1 + (xp.shape[-1] - k) // orig
    frames = frame(xp, k, orig)
    out = np.einsum("...fk,pk->...fp", frames, kern)
    return out.reshape(x.shape[:-1] + (f * new,))[..., :target]
