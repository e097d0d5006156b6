"""Float64 NumPy/SciPy PESQ oracle (sequential lfilter path).

Independent implementation of the P.862-minus-time-alignment recipe the
package implements (see fast_speech_enhancement_metrics_tpu/metrics/pesq.py and
reference: fast_se_metrics/PESQ.py). Deliberately uses *sequential*
``scipy.signal.lfilter`` in float64 — a different numerical path from the
package's frequency-domain filters — so agreement proves both the algorithm
and the FFT-filter approximation.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import butter, lfilter

from fast_speech_enhancement_metrics_tpu.ops.bark import (
    ABS_THRESH_POWER_16K,
    CENTRE_OF_BAND_BARK_16K,
    NR_OF_HZ_BANDS_PER_BARK_BAND_16K,
    POW_DENS_CORRECTION_FACTOR_16K,
    SL_16K,
    SP_16K,
    WIDTH_OF_BAND_BARK_16K,
    ZWICKER_POWER,
)
from tests.oracles.dsp import stft


def _bark_fbank():
    edges = np.concatenate([[0], np.cumsum(NR_OF_HZ_BANDS_PER_BARK_BAND_16K)])
    fbank = np.zeros((49, 256))
    for i in range(49):
        fbank[i, edges[i] : edges[i + 1]] = 1.0
    return fbank


def _align_level(speech):
    b, a = butter(5, [325, 3250], fs=16000, btype="band")
    filtered = lfilter(b, a, speech, axis=-1)
    power = (filtered**2).sum(axis=-1, keepdims=True) / (speech.shape[-1] + 5120) / 1.04684
    return speech * np.sqrt(1e7 / power)


def _pre_emphasize(speech):
    speech = speech.copy()
    taper = np.arange(1, 16) / 16.0
    speech[:, :15] *= taper
    speech[:, -15:] *= taper[::-1]
    b = [2.740826, -5.4816519, 2.740826]
    a = [1.0, -1.9444777, 0.94597794]
    return lfilter(b, a, speech, axis=-1)


def _bark_bands(speech):
    speech = _align_level(speech)
    speech = _pre_emphasize(speech)
    pad = speech.shape[-1] % 256
    if pad > 0:
        speech = np.pad(speech, ((0, 0), (0, pad)))
    z = stft(speech, 512, 256, center=False)
    power = np.abs(z) ** 2
    power[:, :, 0] = 0.0
    bark = power[:, :, :-1] @ _bark_fbank().T
    return bark * (POW_DENS_CORRECTION_FACTOR_16K * SP_16K)


def _audible_frame_power(bark, factor):
    audible = bark > ABS_THRESH_POWER_16K * factor
    return np.sum(bark * audible, axis=2, keepdims=True)


def _equalize_bark_bands(clean_bark, noisy_bark):
    silent = _audible_frame_power(clean_bark, 1e2) < 1e7

    def mean_audible(bark):
        mask = (bark > ABS_THRESH_POWER_16K * 100.0) & (~silent)
        return np.mean(bark * mask, axis=1)

    band_ratio = np.clip(
        (mean_audible(noisy_bark) + 1000.0) / (mean_audible(clean_bark) + 1000.0),
        0.01,
        100.0,
    )
    eq_clean = band_ratio[:, None, :] * clean_bark

    frame_ratio = (_audible_frame_power(eq_clean, 1.0) + 5e3) / (
        _audible_frame_power(noisy_bark, 1.0) + 5e3
    )
    frame_ratio[:, 1:] = 0.8 * frame_ratio[:, 1:] + 0.2 * frame_ratio[:, :-1]
    frame_ratio = np.clip(frame_ratio, 3e-4, 5.0)
    return eq_clean, frame_ratio * noisy_bark


def _loudness(bark):
    exp = np.clip(6.0 / (CENTRE_OF_BAND_BARK_16K + 2.0), 1.0, 2.0) ** 0.15 * ZWICKER_POWER
    loud = (2.0 * ABS_THRESH_POWER_16K) ** exp * (
        (0.5 + 0.5 * bark / ABS_THRESH_POWER_16K) ** exp - 1.0
    )
    loud[bark <= ABS_THRESH_POWER_16K] = 0.0
    return loud * SL_16K


def _weighted_norm(x, p):
    width = WIDTH_OF_BAND_BARK_16K
    total = width[1:].sum()
    scaled = (width * x / total ** (1.0 / p))[:, :, 1:]
    return total * (np.abs(scaled) ** p).sum(axis=2) ** (1.0 / p)


def _overlapping_sums(disturbance):
    n = 1 + (disturbance.shape[1] - 20) // 10
    frames = np.stack([disturbance[:, i * 10 : i * 10 + 20] for i in range(n)], axis=1)
    psqm = np.mean(frames**6, axis=2) ** (1.0 / 6.0)
    return np.sqrt(np.mean(psqm**2, axis=1))


def pesq_oracle(clean, noisy):
    clean = np.atleast_2d(np.asarray(clean, dtype=np.float64))
    noisy = np.atleast_2d(np.asarray(noisy, dtype=np.float64))

    max_value = np.maximum(
        np.abs(clean).max(axis=1, keepdims=True), np.abs(noisy).max(axis=1, keepdims=True)
    )
    clean, noisy = clean / max_value, noisy / max_value

    clean_bark = _bark_bands(clean)
    noisy_bark = _bark_bands(noisy)
    eq_clean, eq_noisy = _equalize_bark_bands(clean_bark, noisy_bark)

    clean_loud = _loudness(eq_clean)
    noisy_loud = _loudness(eq_noisy)

    deadzone = 0.25 * np.minimum(clean_loud, noisy_loud)
    raw = noisy_loud - clean_loud
    disturbance = np.sign(raw) * np.clip(np.abs(raw) - deadzone, 0.0, None)

    symmetric = np.clip(_weighted_norm(disturbance, 2.0), 1e-20, None)

    asym_scaling = ((eq_noisy + 50.0) / (eq_clean + 50.0)) ** 1.2
    asym_scaling[asym_scaling < 3.0] = 0.0
    asym_scaling = np.clip(asym_scaling, None, 12.0)
    asymmetric = np.clip(_weighted_norm(disturbance * asym_scaling, 1.0), 1e-20, None)

    weight = ((_audible_frame_power(eq_clean, 1.0)[..., 0] + 1e5) / 1e7) ** 0.04
    symmetric = np.clip(symmetric / weight, None, 45.0)
    asymmetric = np.clip(asymmetric / weight, None, 45.0)

    mos = 4.5 - 0.1 * _overlapping_sums(symmetric) - 0.0309 * _overlapping_sums(asymmetric)
    return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * mos + 3.8224))
