"""Second-opinion PESQ oracle: a direct torch transcription of the reference.

Round-1 verdict item 4: the package's PESQ and its float64 oracle were both
written by the same author from the same reading of the reference, so a
shared misreading would pass every agreement test. This file closes that
hole the way the verdict prescribed — it transcribes the **reference's own
torch implementation** (MIT-licensed, `/root/reference/fast_se_metrics/
PESQ.py:92-245`, `utils/bark.py:100-204`, `utils/loudness.py:26-67`)
operation-for-operation and constant-for-constant, so any semantic drift in
the package or the float64 oracle shows up as disagreement here.

TEST-ONLY CODE — not part of the framework; intentionally similar to the
reference because being a faithful transcription is its entire purpose.
Substitutions forced by this environment (no torchaudio, no GPU):

* ``torchaudio.functional.lfilter(clamp=False)`` → ``scipy.signal.lfilter``
  (the same direct-form-II-transposed recursion, run in float64),
* ``torchaudio.transforms.Spectrogram`` → ``torch.stft`` with the identical
  window/hop/center/power settings,
* everything runs in float64 on CPU (the reference runs float32), which only
  tightens the comparison.
"""

from __future__ import annotations

import numpy as np
import torch
from scipy.signal import butter, lfilter

# ITU P.862 tables (standard data; reference utils/bark.py:9-76,
# utils/loudness.py:9-19). At nbarks=49 the reference's `interp` evaluates
# interp1d(arange(49)) at exactly 0..48, i.e. the tables pass through.
from fast_speech_enhancement_metrics_tpu.ops.bark import (
    ABS_THRESH_POWER_16K,
    CENTRE_OF_BAND_BARK_16K,
    NR_OF_HZ_BANDS_PER_BARK_BAND_16K,
    POW_DENS_CORRECTION_FACTOR_16K,
    WIDTH_OF_BAND_BARK_16K,
)

SP_16K = 6.910853e-006
SL_16K = 1.866055e-001
ZWICKER_POWER = 0.23

_D = torch.float64


def _tables():
    fbank = torch.zeros(49, 256, dtype=_D)
    current = 0
    for i, n in enumerate(NR_OF_HZ_BANDS_PER_BARK_BAND_16K):
        fbank[i, current : current + n] = 1.0
        current += n
    pow_dens = torch.tensor(POW_DENS_CORRECTION_FACTOR_16K, dtype=_D) * SP_16K
    width_bark = torch.tensor(WIDTH_OF_BAND_BARK_16K, dtype=_D)
    threshs = torch.tensor(ABS_THRESH_POWER_16K, dtype=_D)[None, None, :]
    exp = 6.0 / (torch.tensor(CENTRE_OF_BAND_BARK_16K, dtype=_D) + 2.0)
    exp = exp.clamp(min=1.0, max=2.0) ** 0.15 * ZWICKER_POWER
    return fbank, pow_dens, width_bark, threshs, exp


FBANK, POW_DENS, WIDTH_BARK, THRESHS, EXP = _tables()
TOTAL_WIDTH = WIDTH_BARK[1:].sum()

# reference PESQ.py:80: butter(5, [325, 3250], fs=16000, btype="band")
_POWER_B, _POWER_A = butter(5, [325, 3250], fs=16000, btype="band")
# reference PESQ.py:84-88
_PRE_B = np.array([2.740826, -5.4816519, 2.740826])
_PRE_A = np.array([1.0, -1.9444777, 0.94597794])
_TAPER = torch.linspace(0, 15, 16, dtype=_D)[1:] / 16.0


def _align_level(speech: torch.Tensor) -> torch.Tensor:
    # reference PESQ.py:92-102 (incl. the +5120 / 1.04684 power quirks)
    filtered = torch.from_numpy(lfilter(_POWER_B, _POWER_A, speech.numpy(), axis=1))
    power = filtered.square().sum(dim=1, keepdim=True) / (filtered.shape[1] + 5120) / 1.04684
    return speech * (10**7 / power).sqrt()


def _pre_emphasize(speech: torch.Tensor) -> torch.Tensor:
    # reference PESQ.py:104-113
    speech = speech.clone()
    speech[:, :15] *= _TAPER
    speech[:, -15:] *= torch.flip(_TAPER, dims=(0,))
    return torch.from_numpy(lfilter(_PRE_B, _PRE_A, speech.numpy(), axis=1))


def _audible_frame_power(bark_bands, factor):
    # reference loudness.py:48-53
    mask = bark_bands > THRESHS * factor
    return torch.sum(bark_bands * mask, dim=2, keepdim=True)


def _mean_audible_band_power(bark_bands, frame_is_silent):
    # reference loudness.py:55-60
    mask = (bark_bands > THRESHS * 100.0) * (~frame_is_silent)
    return torch.mean(bark_bands * mask, dim=1)


def _loudness(power_density):
    # reference loudness.py:62-67 (Zwicker law incl. the <= zeroing)
    loud = (2.0 * THRESHS) ** EXP * ((0.5 + 0.5 * power_density / THRESHS) ** EXP - 1)
    loud[power_density <= THRESHS] = 0.0
    return loud * SL_16K


def _weighted_norm(tensor, p):
    # reference bark.py:169-184
    return TOTAL_WIDTH * (WIDTH_BARK * tensor / TOTAL_WIDTH ** (1 / p))[:, :, 1:].norm(p, dim=2)


def _get_bark_bands(speech: torch.Tensor) -> torch.Tensor:
    # reference PESQ.py:123-140
    speech = _align_level(speech)
    speech = _pre_emphasize(speech)

    pad_amount = speech.shape[1] % 256  # quirk: pads BY the remainder
    if pad_amount > 0:
        speech = torch.nn.functional.pad(speech, (0, pad_amount))

    # Spectrogram(win=512, n_fft=512, hop=256, hann, power=2, center=False)
    spec = torch.stft(
        speech,
        n_fft=512,
        hop_length=256,
        win_length=512,
        window=torch.hann_window(512, dtype=_D, periodic=True),
        center=False,
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = spec.abs().square().swapaxes(1, 2)
    spec[:, :, 0] = 0.0
    bark = torch.einsum("ij,klj->kli", FBANK, spec[:, :, :-1])
    return bark * POW_DENS


def _equalize_bark_bands(clean_bark, noisy_bark):
    # reference PESQ.py:142-166
    frame_is_silent = _audible_frame_power(clean_bark, 1e2) < 1e7

    mean_clean = _mean_audible_band_power(clean_bark, frame_is_silent)
    mean_noisy = _mean_audible_band_power(noisy_bark, frame_is_silent)

    band_ratio = ((mean_noisy + 1000) / (mean_clean + 1000)).clamp(min=0.01, max=100.0)
    eq_clean = band_ratio.unsqueeze(1) * clean_bark

    frame_ratio = (_audible_frame_power(eq_clean, 1) + 5e3) / (
        _audible_frame_power(noisy_bark, 1) + 5e3
    )
    frame_ratio[:, 1:] = 0.8 * frame_ratio[:, 1:] + 0.2 * frame_ratio[:, :-1]
    frame_ratio = frame_ratio.clamp(min=3e-4, max=5.0)

    return eq_clean, frame_ratio * noisy_bark


def _overlapping_sums(disturbance):
    # reference PESQ.py:168-172
    frames = disturbance.unfold(1, size=20, step=10)
    psqm = frames.pow(6).mean(dim=2).pow(1 / 6)
    return psqm.square().mean(dim=1).sqrt()


def pesq_torch_oracle(clean_speech, denoised_speech) -> np.ndarray:
    """Batched PESQ scores via the transcribed reference pipeline
    (reference PESQ.py:174-245)."""
    clean = torch.atleast_2d(torch.as_tensor(np.asarray(clean_speech), dtype=_D))
    noisy = torch.atleast_2d(torch.as_tensor(np.asarray(denoised_speech), dtype=_D))
    batch = clean.shape[0]

    max_value = torch.max(
        clean.abs().amax(dim=1, keepdim=True), noisy.abs().amax(dim=1, keepdim=True)
    )
    clean, noisy = clean / max_value, noisy / max_value

    bark = _get_bark_bands(torch.cat([clean, noisy], dim=0))
    eq_clean, eq_noisy = _equalize_bark_bands(bark[:batch], bark[batch:])

    loud = _loudness(torch.cat([eq_clean, eq_noisy], dim=0))
    clean_loud, noisy_loud = loud[:batch], loud[batch:]

    deadzone = 0.25 * torch.min(clean_loud, noisy_loud)
    disturbance = noisy_loud - clean_loud
    disturbance = disturbance.sign() * (disturbance.abs() - deadzone).clamp(min=0)

    symmetric = _weighted_norm(disturbance, p=2).clamp(min=1e-20)

    asym_scale = ((eq_noisy + 50.0) / (eq_clean + 50.0)).pow(1.2)
    asym_scale[asym_scale < 3.0] = 0.0
    asym_scale = asym_scale.clamp(max=12.0)
    asymmetric = _weighted_norm(disturbance * asym_scale, p=1).clamp(min=1e-20)

    weight = ((_audible_frame_power(eq_clean, 1) + 1e5) / 1e7).pow(0.04).squeeze(-1)
    symmetric = (symmetric / weight).clamp(max=45.0)
    asymmetric = (asymmetric / weight).clamp(max=45.0)

    sym_dist = _overlapping_sums(symmetric)
    asym_dist = _overlapping_sums(asymmetric)

    mos = 4.5 - 0.1 * sym_dist - 0.0309 * asym_dist
    mos = 0.999 + 4 / (1 + torch.exp(-1.3669 * mos + 3.8224))
    return mos.numpy()
