"""STOI / ESTOI (Taal short-time objective intelligibility), TPU-native.

Behavioral contract (reference: fast_se_metrics/STOI.py:7-205, itself matching
pystoi to abs 5e-4):

* 10 kHz, 256-sample Hann frames, hop 128,
* silent-frame removal: drop frames >40 dB below the loudest clean frame,
  overlap-add the survivors back into a signal,
* 512-point STFT (window center-padded), 15 one-third-octave bands from
  150 Hz, sqrt of band energies,
* sliding 30-frame segments; STOI normalizes per (band, segment) with a
  clip at -15 dB SDR; ESTOI additionally row-normalizes across bands,
* score = mean segment correlation.

TPU design — everything static-shape under jit:

* ragged "remove silent frames" becomes a stable-argsort *compaction*
  (kept frames gathered to the front, tail zeroed) — no boolean indexing,
* 50 %-overlap OLA is a pad-and-add of the two frame halves — no scatter,
* the clean/denoised pair rides one doubled batch axis through the STFT,
* per-utterance raggedness is carried as a ``lengths`` vector + masks,
* segment extraction is a static gather; correlations are masked reductions.

Known deviation: the reference injects 1e-12-scale Gaussian noise inside
``normalize`` (STOI.py:116) purely to avoid 0/0 on padded segments, making its
results nondeterministic at the 1e-12 level. We use a guarded divide instead —
deterministic, and identical to well within the 5e-4 contract.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.base import BaseMetric
from fast_speech_enhancement_metrics_tpu.ops.dft import framed_rdft_center_half
from fast_speech_enhancement_metrics_tpu.ops.stft import hann_window


def third_octave_band_matrix(
    num_bands: int = 15,
    min_frequency: float = 150.0,
    n_fft: int = 512,
    sample_rate: int = 10000,
) -> np.ndarray:
    """0/1 matrix mapping rFFT bins to 1/3-octave bands (float64-derived)."""
    num_frequencies = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate // 2, num_frequencies, dtype=np.float64)
    k = np.arange(num_bands, dtype=np.float64)
    f_low = min_frequency * 2.0 ** ((2 * k - 1) / 6)
    f_high = min_frequency * 2.0 ** ((2 * k + 1) / 6)
    obm = np.zeros((num_bands, num_frequencies), dtype=np.float64)
    for i in range(num_bands):
        lo = int(np.argmin(np.abs(freqs - f_low[i])))
        hi = int(np.argmin(np.abs(freqs - f_high[i])))
        obm[i, lo:hi] = 1.0
    return obm.astype(np.float32)


class STOI(BaseMetric):
    higher_is_better = True
    EXPECTED_SAMPLING_RATE = 10000
    #: bf16x3 block-resample passes: ~1e-6 relative against the 5e-4 score
    #: contract (validated on-chip vs the float64 oracle)
    RESAMPLE_PRECISION = "high"

    def __init__(self, sample_rate: int = 10000, segment_impl: str = "auto", **kw):
        """``segment_impl``: "fused" (Pallas kernel — the (B, n_seg, 15, 30)
        sliding-segment tensor never touches HBM, see ops/stoi_fused.py),
        "xla" (materialized segments + masked reductions), or "auto" (fused
        on a single TPU device, xla under a mesh or on CPU)."""
        super().__init__(sample_rate, **kw)
        assert segment_impl in ("auto", "fused", "xla")
        self.segment_impl = segment_impl
        self.win_length = 256
        self.hop = self.win_length // 2
        self.n_fft = 512
        self.num_octave_bands = 15
        self.N = 30  # frames per intermediate-intelligibility segment
        self.beta = -15.0  # lower SDR clip bound (dB)
        self.dynamic_range = 40.0
        self.obm = third_octave_band_matrix(
            self.num_octave_bands, 150.0, self.n_fft, self.EXPECTED_SAMPLING_RATE
        )
        # asymmetric Hann used by pystoi and the reference (STOI.py:24)
        self.window = hann_window(self.win_length + 1)[1:]
        # STFT window: the 256-tap window center-padded to 512 (torch.stft rule)
        self.stft_window = np.pad(self.window, (128, 128))
        # bins past the top 1/3-octave band (~4.3 kHz, bin 219) never reach a
        # band sum — trim them out of the DFT matmul, rounded so the packed
        # 4*n_bins output is an exact multiple of 128 lanes
        top_bin = int(np.flatnonzero(self.obm.any(axis=0))[-1]) + 1
        self.dft_bins = -(-top_bin // 32) * 32

    # -- silent-frame removal (static shapes) --------------------------------

    def _remove_silent_frames(self, clean, denoised):
        """Chunk-space formulation: frame f = [chunk_f | chunk_{f+1}] of the
        hop-sized chunk grid, so frame energies decompose into per-chunk
        partial sums and the OLA output gathers raw 128-chunks (window
        halves applied after the gather) — the (B, F, 256) windowed-frames
        tensors of the direct form never exist, halving the stage's HBM
        gather traffic. Same kept-frame semantics as the reference
        (fast_se_metrics/STOI.py:88-111), bit-for-bit window math."""
        hop, wl = self.hop, self.win_length
        batch, t = clean.shape
        n_frames = 1 + (t - wl) // hop
        n_chunks = n_frames + 1
        wa = jnp.asarray(self.window[:hop])
        wb = jnp.asarray(self.window[hop:])

        def chunks_of(x):
            pad = n_chunks * hop - t
            if pad > 0:
                x = jnp.pad(x, ((0, 0), (0, pad)))
            return x[:, : n_chunks * hop].reshape(batch, n_chunks, hop)

        xc, xd = chunks_of(clean), chunks_of(denoised)

        # frame energy^2 = ||chunk_f * w_a||^2 + ||chunk_{f+1} * w_b||^2
        e_a = jnp.sum((xc * wa) ** 2, axis=2)  # (B, C)
        e_b = jnp.sum((xc * wb) ** 2, axis=2)
        energies = 20.0 * jnp.log10(
            jnp.sqrt(e_a[:, :-1] + e_b[:, 1:]) + 1e-9
        )  # (B, F)
        keep = (
            jnp.amax(energies, axis=1, keepdims=True) - self.dynamic_range - energies
        ) < 0  # (B, F)
        num_kept = jnp.sum(keep, axis=1)  # (B,)

        # stable compaction: kept frames to the front, original order preserved
        order = jnp.argsort(jnp.logical_not(keep), axis=1, stable=True)
        slot_valid = (
            jnp.arange(n_frames)[None, :] < num_kept[:, None]
        )  # (B, F)

        # 50%-overlap OLA over kept frames: out chunk j sums the w_b half of
        # kept frame j-1 (raw chunk order[j-1]+1) and the w_a half of kept
        # frame j (raw chunk order[j])
        def ola(xx):
            a = jnp.take_along_axis(xx, order[:, :, None], axis=1)
            a = a * wa * slot_valid[:, :, None]
            b = jnp.take_along_axis(xx, order[:, :, None] + 1, axis=1)
            b = b * wb * slot_valid[:, :, None]
            out = jnp.pad(a, ((0, 0), (0, 1), (0, 0))) + jnp.pad(
                b, ((0, 0), (1, 0), (0, 0))
            )
            return out.reshape(batch, -1)

        lengths = (num_kept + 1) * hop
        return ola(xc), ola(xd), lengths

    # -- spectral front-end ---------------------------------------------------

    def _band_envelopes(self, speech, lengths):
        """(2B, T') -> sqrt third-octave band energies (2B, F_spec, 15), masked."""
        # MXU framed DFT with the 256-tap window center-padded to 512
        # (torch.stft rule). The center-half chunk factorization shares each
        # hop-chunk's windowed DFT between the two frames that contain it —
        # half the MXU FLOPs of the shift-decomposed framed_rdft (ops/dft.py).
        # bf16x3 ("high") passes: ~1e-6 relative DFT error against a 5e-4
        # score contract with 1.6e-7 measured headroom — 2x fewer MXU passes
        # than "highest" (verified on-chip vs the float64 oracle)
        re, im = framed_rdft_center_half(
            speech, self.n_fft, self.hop, window=self.stft_window,
            precision="high", n_bins=self.dft_bins,
        )
        power = re * re + im * im  # (2B, F_spec, dft_bins)

        spec_lengths = 1 + (lengths - self.n_fft) // self.hop
        t_idx = jnp.arange(power.shape[1])
        valid = t_idx[None, :] < spec_lengths[:, None]
        power = power * valid[:, :, None]

        tob = jnp.sqrt(
            jnp.einsum(
                "bfk,jk->bfj",
                power,
                jnp.asarray(self.obm[:, : self.dft_bins]),
                precision="highest",
            )
        )
        return tob  # (2B, F_spec, 15)

    # -- segment machinery ----------------------------------------------------

    @staticmethod
    def _segments(tob, n_seg, n_frames):
        """(B, F, 15) -> (B, n_seg, 15, N) sliding windows over the frame axis.

        Stacked static slices (stride-1 windows), not a gather — same shape
        the reference builds with a Python list of views (STOI.py:126), but
        XLA sees N cheap slice ops.
        """
        seg = jnp.stack(
            [tob[:, m : m + n_seg, :] for m in range(n_frames)], axis=-1
        )  # (B, n_seg, 15, N)
        return seg

    @staticmethod
    def _normalize(x, axis):
        x = x - jnp.mean(x, axis=axis, keepdims=True)
        norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
        return x / jnp.maximum(norm, 1e-30)

    def _equalize_clip(self, clean_seg, denoised_seg):
        consts = jnp.linalg.norm(clean_seg, axis=3, keepdims=True) / (
            jnp.linalg.norm(denoised_seg, axis=3, keepdims=True) + 1e-9
        )
        normalized = denoised_seg * consts
        clip_value = 10.0 ** (-self.beta / 20.0)
        return jnp.minimum(normalized, clean_seg * (1.0 + clip_value))

    # -- main -----------------------------------------------------------------

    def compute(self, clean_speech, denoised_speech):
        scores = super().compute(clean_speech, denoised_speech)
        num_segments = scores.pop("_num_segments", None)
        if num_segments is not None and bool(
            np.any(np.asarray(num_segments) == 0)
        ):
            warnings.warn(
                "Not enough non-silent frames. Please check your sound files",
                RuntimeWarning,
                stacklevel=2,
            )
        return scores

    def _compute(self, clean, denoised):
        assert clean is not None
        batch = clean.shape[0]
        n_frames_sig = 1 + (clean.shape[1] - self.win_length) // self.hop
        # reconstructed signal has (F+1)*hop samples -> F-2 STFT frames
        n_spec = 1 + ((n_frames_sig + 1) * self.hop - self.n_fft) // self.hop
        n_seg = n_spec - self.N + 1
        if n_seg <= 0:
            warnings.warn(
                "Not enough non-silent frames. Please check your sound files",
                RuntimeWarning,
                stacklevel=2,
            )
            zero = jnp.zeros((batch,), dtype=clean.dtype)
            return {"STOI": zero, "ESTOI": zero}

        c_sig, d_sig, lengths = self._remove_silent_frames(clean, denoised)

        speech = jnp.concatenate([c_sig, d_sig], axis=0)
        tob = self._band_envelopes(speech, jnp.concatenate([lengths, lengths]))

        num_segments = jnp.maximum(
            (lengths - self.n_fft) // self.hop - self.N + 2, 0
        )

        use_fused = (
            self.mesh is None and self._on_tpu()
            if self.segment_impl == "auto"
            else self.segment_impl == "fused"
        )
        if use_fused:
            from fast_speech_enhancement_metrics_tpu.ops.stoi_fused import (
                stoi_segment_sums,
            )

            stoi_sum, estoi_sum = stoi_segment_sums(
                tob[:batch],
                tob[batch:],
                num_segments,
                n=self.N,
                num_bands=self.num_octave_bands,
                interpret=not self._on_tpu(),
            )
            stoi = stoi_sum / self.num_octave_bands
            estoi = estoi_sum / self.N
            safe = jnp.maximum(num_segments, 1).astype(stoi.dtype)
            has_seg = num_segments > 0
            return {
                "STOI": jnp.where(has_seg, stoi / safe, 0.0),
                "ESTOI": jnp.where(has_seg, estoi / safe, 0.0),
                "_num_segments": num_segments,
            }

        seg = self._segments(tob, n_seg, self.N)  # (2B, n_seg, 15, N)
        clean_seg, denoised_seg = seg[:batch], seg[batch:]

        equalized = self._equalize_clip(clean_seg, denoised_seg)

        clean_stoi = self._normalize(clean_seg, axis=3)
        equalized = self._normalize(equalized, axis=3)

        clean_estoi = self._normalize(self._normalize(clean_seg, axis=3), axis=2)
        denoised_estoi = self._normalize(
            self._normalize(denoised_seg, axis=3), axis=2
        )

        seg_mask = (
            jnp.arange(n_seg)[None, :] < num_segments[:, None]
        ).astype(clean.dtype)

        def correlation(a, b, normalization):
            comp = a * b * seg_mask[:, :, None, None]
            return jnp.sum(comp, axis=(1, 2, 3)) / normalization

        stoi = correlation(clean_stoi, equalized, self.num_octave_bands)
        estoi = correlation(clean_estoi, denoised_estoi, self.N)

        # an utterance whose surviving frames yield zero segments scores 0.0
        # (reference: fast_se_metrics/STOI.py:163-165 — warn + zeros); the
        # warning is emitted host-side in ``compute`` from _num_segments
        safe = jnp.maximum(num_segments, 1).astype(stoi.dtype)
        has_seg = num_segments > 0
        return {
            "STOI": jnp.where(has_seg, stoi / safe, 0.0),
            "ESTOI": jnp.where(has_seg, estoi / safe, 0.0),
            "_num_segments": num_segments,
        }
