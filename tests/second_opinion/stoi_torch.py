"""Second-opinion STOI/ESTOI oracle: a direct torch transcription of the
reference.

Round-1 verdict item 4 (see pesq_torch.py for the full rationale): this file
transcribes the **reference's own torch implementation**
(`/root/reference/fast_se_metrics/STOI.py:26-198`, MIT-licensed)
operation-for-operation — including the 1/3-octave band-edge `argmin`
rounding the verdict specifically called out as the kind of detail a shared
misreading could hide — so the package and its float64 oracle are both
checked against an independently-transcribed pipeline.

TEST-ONLY CODE — intentionally similar to the reference because being a
faithful transcription is its entire purpose. Differences forced by intent:

* float64 on CPU throughout (the reference runs float32),
* the reference's ``normalize`` adds ``1e-12 * randn`` jitter
  (STOI.py:116) purely to dodge 0/0 in silent bands; an oracle must be
  deterministic, so the jitter is omitted (effect is below 1e-10 on any
  non-degenerate fixture),
* the per-utterance scatter_add overlap-add loop is expressed with
  ``index_add_`` (same arithmetic, one call per utterance).

Expects 10 kHz input (the reference resamples 16 k→10 k in BaseMetric;
callers here resample explicitly so the resampler under test is not part of
the oracle).
"""

from __future__ import annotations

import numpy as np
import torch

_D = torch.float64

WIN_LENGTH = 256
HOP = 128
N_FFT = 512
NUM_BANDS = 15
MIN_FREQ = 150
N_SEG = 30
BETA = -15.0
DYNAMIC_RANGE = 40
FS = 10000

# reference STOI.py:24 — hann_window(257)[1:]
WINDOW = torch.hann_window(WIN_LENGTH + 1, dtype=_D)[1:]


def octave_band_matrix() -> torch.Tensor:
    # reference STOI.py:26-47 (note the argmin bin snapping in float64)
    num_frequencies = N_FFT // 2 + 1
    frequencies = torch.linspace(0, FS // 2, num_frequencies, dtype=_D)
    band_idx = torch.arange(NUM_BANDS, dtype=_D)
    freq_low = MIN_FREQ * torch.pow(torch.tensor(2.0, dtype=_D), (2 * band_idx - 1) / 6)
    freq_high = MIN_FREQ * torch.pow(torch.tensor(2.0, dtype=_D), (2 * band_idx + 1) / 6)

    obm = torch.zeros((NUM_BANDS, num_frequencies), dtype=_D)
    for i in range(NUM_BANDS):
        idx_low = torch.argmin((frequencies - freq_low[i]).abs())
        idx_high = torch.argmin((frequencies - freq_high[i]).abs())
        obm[i, idx_low:idx_high] = 1
    return obm


OBM = octave_band_matrix()


def _stft(speech: torch.Tensor, lengths: torch.Tensor) -> torch.Tensor:
    # reference STOI.py:49-69
    spec = torch.stft(
        speech,
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN_LENGTH,
        window=WINDOW,
        center=False,
        normalized=False,
        return_complex=True,
        onesided=True,
    )
    spec = spec.abs().square()
    spec_lengths = 1 + (lengths - N_FFT) // HOP
    time_idx = torch.arange(spec.shape[-1])
    mask = time_idx.unsqueeze(0) >= spec_lengths.unsqueeze(1)
    spec.masked_fill_(mask.unsqueeze(1), 0)
    return spec


def _overlap_and_add(frames: torch.Tensor, lengths: torch.Tensor):
    # reference STOI.py:71-86
    final_lengths = (lengths + 1) * HOP
    max_length = int(torch.max(final_lengths).item())
    signal = torch.zeros((len(final_lengths), max_length), dtype=frames.dtype)
    for i, frame in enumerate(frames.split(lengths.tolist())):
        idx = torch.arange(WIN_LENGTH).unsqueeze(0) + HOP * torch.arange(
            int(lengths[i].item())
        ).unsqueeze(1)
        signal[i].index_add_(0, idx.flatten(), frame.flatten())
    return signal, final_lengths


def _remove_silent_frames(clean: torch.Tensor, noisy: torch.Tensor):
    # reference STOI.py:88-111
    clean_frames = clean.unfold(1, WIN_LENGTH, HOP) * WINDOW
    noisy_frames = noisy.unfold(1, WIN_LENGTH, HOP) * WINDOW

    energies = 20 * torch.log10(torch.norm(clean_frames, dim=2) + 1e-9)
    mask = (torch.amax(energies, dim=1, keepdim=True) - DYNAMIC_RANGE - energies) < 0

    num_frames = mask.sum(1)
    clean_sig, lengths = _overlap_and_add(clean_frames[mask], num_frames)
    noisy_sig, _ = _overlap_and_add(noisy_frames[mask], num_frames)
    return clean_sig, noisy_sig, lengths


def _normalize(x: torch.Tensor, dim: int) -> torch.Tensor:
    # reference STOI.py:113-119. The randn jitter is omitted (see module
    # docstring); the norm clamp replaces it — it only fires for the
    # all-zero padded segments past each utterance's num_segments, which
    # would otherwise turn 0/0-NaN and survive the ×0 mask (NaN*0 = NaN).
    x = x - x.mean(dim=dim, keepdim=True)
    return x / torch.norm(x, p=2, dim=dim, keepdim=True).clamp(min=1e-300)


def stoi_torch_oracle(clean_speech, denoised_speech):
    """(stoi, estoi) per utterance via the transcribed reference pipeline
    (reference STOI.py:121-198). Inputs must already be at 10 kHz."""
    clean = torch.atleast_2d(torch.as_tensor(np.asarray(clean_speech), dtype=_D))
    noisy = torch.atleast_2d(torch.as_tensor(np.asarray(denoised_speech), dtype=_D))
    batch = clean.shape[0]

    clean, noisy, lengths = _remove_silent_frames(clean, noisy)

    speech = torch.cat((clean, noisy), dim=0)
    spec = _stft(speech, torch.cat((lengths, lengths), dim=0))
    tob = torch.sqrt(torch.einsum("bf,kft->kbt", OBM, spec))
    seg_list = [tob[:, :, m : m + N_SEG] for m in range(max(tob.shape[2] - N_SEG + 1, 0))]
    if not seg_list:
        return np.zeros(batch), np.zeros(batch)
    segments = torch.stack(seg_list, dim=1)

    clean_seg, noisy_seg = segments[:batch], segments[batch:]

    # reference STOI.py:129-139 — equalize + clip
    norm_consts = torch.norm(clean_seg, dim=3, keepdim=True) / (
        torch.norm(noisy_seg, dim=3, keepdim=True) + 1e-9
    )
    clip_value = 10 ** (-BETA / 20)
    eq_noisy_seg = torch.minimum(noisy_seg * norm_consts, clean_seg * (1 + clip_value))

    clean_stoi = _normalize(clean_seg.clone(), dim=3)
    eq_noisy_stoi = _normalize(eq_noisy_seg, dim=3)

    clean_estoi = _normalize(_normalize(clean_seg.clone(), dim=3), dim=2)
    noisy_estoi = _normalize(_normalize(noisy_seg.clone(), dim=3), dim=2)

    num_segments = torch.maximum(
        (lengths - N_FFT) // HOP - N_SEG + 2, torch.zeros_like(lengths)
    )
    seg_mask = (
        torch.arange(clean_seg.shape[1]).unsqueeze(0) < num_segments.unsqueeze(1)
    ).to(_D)

    def correlation(c, d, normalization):
        comp = d * c * seg_mask.unsqueeze(2).unsqueeze(3)
        return torch.sum(comp, dim=(1, 2, 3)) / normalization

    stoi = correlation(clean_stoi, eq_noisy_stoi, NUM_BANDS) / num_segments
    estoi = correlation(clean_estoi, noisy_estoi, N_SEG) / num_segments
    return stoi.numpy(), estoi.numpy()
