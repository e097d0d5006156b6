"""Float64 NumPy oracle for LSD, following the urgent2025 recipe that the
reference's LSD implements (reference: fast_se_metrics/LSD.py:32-52 and the
librosa-based adapter tests/reference_metrics/LSD_reference.py)."""

from __future__ import annotations

import numpy as np

from tests.oracles.dsp import stft


def lsd_oracle(clean: np.ndarray, denoised: np.ndarray, sr: int = 16000) -> np.ndarray:
    clean = clean.astype(np.float64)
    denoised = denoised.astype(np.float64)
    nfft = int(sr * 0.032)
    hop = int(sr * 0.016)
    eps = 1e-8

    scale = np.sum(clean * denoised, axis=1, keepdims=True) / (
        np.sum(denoised**2, axis=1, keepdims=True) + eps
    )
    denoised = denoised * scale

    c = np.abs(stft(clean, nfft, hop, center=True))
    d = np.abs(stft(denoised, nfft, hop, center=True))

    log_ratio = np.log(c**2 / (d + eps) ** 2 + eps) ** 2
    # freq is the last axis in our frames-major layout
    return np.mean(np.sqrt(np.mean(log_ratio, axis=2)), axis=1)
