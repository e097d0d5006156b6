"""Float64 NumPy/SciPy oracle for fast SDR (Scheibler formulation, as in
TorchMetrics' signal_distortion_ratio; reference: fast_se_metrics/SDR.py)."""

from __future__ import annotations

import numpy as np
import scipy.linalg


def sdr_oracle(
    clean: np.ndarray,
    denoised: np.ndarray,
    filter_length: int = 512,
    zero_mean: bool = False,
) -> np.ndarray:
    clean = clean.astype(np.float64)
    denoised = denoised.astype(np.float64)
    if zero_mean:
        clean = clean - clean.mean(-1, keepdims=True)
        denoised = denoised - denoised.mean(-1, keepdims=True)

    clean = clean / np.maximum(np.linalg.norm(clean, axis=-1, keepdims=True), 1e-6)
    denoised = denoised / np.maximum(
        np.linalg.norm(denoised, axis=-1, keepdims=True), 1e-6
    )

    n_fft = 2 ** int(np.ceil(np.log2(clean.shape[-1] + denoised.shape[-1] - 1)))
    t_fft = np.fft.rfft(clean, n=n_fft, axis=-1)
    p_fft = np.fft.rfft(denoised, n=n_fft, axis=-1)
    r0 = np.fft.irfft(np.abs(t_fft) ** 2, n=n_fft)[..., :filter_length]
    b = np.fft.irfft(np.conj(t_fft) * p_fft, n=n_fft)[..., :filter_length]

    out = np.empty(clean.shape[0])
    for i in range(clean.shape[0]):
        sol = scipy.linalg.solve_toeplitz((r0[i], r0[i]), b[i])
        coh = float(b[i] @ sol)
        ratio = coh / max(1.0 - coh, 1e-8)
        out[i] = 10.0 * np.log10(max(ratio, 1e-8))
    return out
