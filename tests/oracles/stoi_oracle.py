"""Float64 ragged NumPy oracle for STOI/ESTOI.

Implements the Taal STOI contract (as validated by the reference against
pystoi, tests/reference/test_stoi.py tolerance abs 5e-4) with genuinely
dynamic shapes: per-utterance loops, boolean frame removal, ragged OLA.
This is the independent counterpart of the package's masked static-shape
TPU implementation.
"""

from __future__ import annotations

import numpy as np


def _thirdoct(fs: int = 10000, nfft: int = 512, num_bands: int = 15,
              min_freq: float = 150.0) -> np.ndarray:
    """1/3-octave band matrix, derived independently of the package.

    Follows the published pystoi ``thirdoct`` convention (Taal et al. 2011,
    eq. 1 band edges): bin grid ``linspace(0, fs, nfft+1)`` truncated to the
    one-sided spectrum, band edges ``min_freq * 2**((2k -/+ 1)/6)`` snapped
    to the nearest bin by squared distance. Kept free of any import from
    ``fast_speech_enhancement_metrics_tpu`` so a shared misreading of the
    edge-rounding convention cannot cancel out in the agreement tests.
    """
    f = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num_bands, dtype=np.float64)
    freq_low = min_freq * 2.0 ** ((2 * k - 1) / 6)
    freq_high = min_freq * 2.0 ** ((2 * k + 1) / 6)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        lo = int(np.argmin(np.square(f - freq_low[i])))
        hi = int(np.argmin(np.square(f - freq_high[i])))
        obm[i, lo:hi] = 1.0
    return obm


def _hann_asym(n: int) -> np.ndarray:
    return 0.5 * (1 - np.cos(2 * np.pi * np.arange(1, n + 1) / (n + 1)))


def _frames(x: np.ndarray, win: int, hop: int) -> np.ndarray:
    f = 1 + (len(x) - win) // hop
    return np.stack([x[i * hop : i * hop + win] for i in range(f)])


def _stoi_single(clean: np.ndarray, denoised: np.ndarray) -> tuple[float, float]:
    win, hop, n_fft, n_bands, N, beta, dyn = 256, 128, 512, 15, 30, -15.0, 40.0
    w = _hann_asym(win)

    c_frames = _frames(clean, win, hop) * w
    d_frames = _frames(denoised, win, hop) * w
    energies = 20 * np.log10(np.linalg.norm(c_frames, axis=1) + 1e-9)
    keep = energies > energies.max() - dyn
    c_frames, d_frames = c_frames[keep], d_frames[keep]
    nk = len(c_frames)

    # ragged OLA
    length = (nk + 1) * hop
    c_sig = np.zeros(length)
    d_sig = np.zeros(length)
    for j in range(nk):
        c_sig[j * hop : j * hop + win] += c_frames[j]
        d_sig[j * hop : j * hop + win] += d_frames[j]

    # STFT with 512-sample slices, center-padded 256-tap window
    wpad = np.pad(w, (128, 128))
    n_spec = 1 + (length - n_fft) // hop
    if n_spec < 1:
        return 0.0, 0.0
    obm = _thirdoct()

    def tob(sig):
        fr = np.stack([sig[i * hop : i * hop + n_fft] for i in range(n_spec)]) * wpad
        power = np.abs(np.fft.rfft(fr, axis=-1)) ** 2
        return np.sqrt(power @ obm.T)  # (n_spec, 15)

    c_tob, d_tob = tob(c_sig), tob(d_sig)

    n_seg = n_spec - N + 1
    if n_seg < 1:
        return 0.0, 0.0

    def normalize(x, axis):
        x = x - x.mean(axis=axis, keepdims=True)
        nrm = np.linalg.norm(x, axis=axis, keepdims=True)
        return x / np.maximum(nrm, 1e-300)

    stoi_sum, estoi_sum = 0.0, 0.0
    clip = 10 ** (-beta / 20)
    for m in range(n_seg):
        c = c_tob[m : m + N].T  # (15, N)
        d = d_tob[m : m + N].T
        consts = np.linalg.norm(c, axis=1, keepdims=True) / (
            np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        )
        d_eq = np.minimum(d * consts, c * (1 + clip))
        cn = normalize(c, 1)
        dn = normalize(d_eq, 1)
        stoi_sum += float((cn * dn).sum()) / n_bands

        ce = normalize(normalize(c, 1), 0)
        de = normalize(normalize(d, 1), 0)
        estoi_sum += float((ce * de).sum()) / N

    return stoi_sum / n_seg, estoi_sum / n_seg


def stoi_oracle(clean: np.ndarray, denoised: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched wrapper; inputs (B, T) at 10 kHz, float64 math."""
    stois, estois = [], []
    for c, d in zip(clean.astype(np.float64), denoised.astype(np.float64)):
        s, e = _stoi_single(c, d)
        stois.append(s)
        estois.append(e)
    return np.array(stois), np.array(estois)
