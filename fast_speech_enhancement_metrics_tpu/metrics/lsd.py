"""Log-Spectral Distance (urgent2025 recipe), TPU-native.

Behavioral contract (reference: fast_se_metrics/LSD.py:6-52, itself following
the urgent2025 challenge recipe):

* project the denoised signal onto the clean signal (least-squares scale),
* centered STFT, n_fft = 0.032*sr, hop = 0.016*sr, Hann window, constant pad
  (librosa-compatible magnitudes),
* LSD = mean_t sqrt(mean_f [log(|C|^2 / (|D|+eps)^2 + eps)]^2).

TPU design: one fused jitted graph; the clean/denoised pair rides a single
leading batch axis (2B) through the STFT so XLA sees one FFT; scores reduce to
a (B,) vector on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from fast_speech_enhancement_metrics_tpu.base import BaseMetric
from fast_speech_enhancement_metrics_tpu.ops.dft import framed_spectrogram


class LSD(BaseMetric):
    higher_is_better = False
    EXPECTED_SAMPLING_RATE = 16000

    def __init__(self, sample_rate: int = 16000, spectral_impl: str = "auto", **kw):
        """``spectral_impl``: "fused" (Pallas kernel — the spectrogram never
        touches HBM, half the DFT matmul FLOPs via the shared-chunk
        factorization, see ops/lsd_fused.py), "xla" (framed-DFT matmuls +
        fused epilogue), or "auto" (fused on a single TPU device, xla under
        a mesh or on CPU)."""
        super().__init__(sample_rate, **kw)
        self.nfft = int(self.EXPECTED_SAMPLING_RATE * 0.032)
        self.hop = int(self.EXPECTED_SAMPLING_RATE * 0.016)
        self.p = 2
        self.eps = 1e-8
        assert spectral_impl in ("auto", "fused", "xla")
        self.spectral_impl = spectral_impl
        #: fused-kernel grid tile height (frames per Pallas grid step)
        self.frame_block = 256

    def _use_fused(self) -> bool:
        if self.spectral_impl == "auto":
            return self.mesh is None and self._on_tpu()
        return self.spectral_impl == "fused"

    def _compute(self, clean, denoised):
        assert clean is not None
        batch = clean.shape[0]

        if self._use_fused():
            from fast_speech_enhancement_metrics_tpu.ops.lsd_fused import lsd_scores

            # "auto": hop-aligned inputs compute the projection scale
            # in-kernel from the resident chunks — the XLA prep otherwise
            # re-reads both (B, T) signals for two reductions
            # (~0.25 ms/eval at batch 64, tools/prof_lsd_floor.py)
            return {
                "LSD": lsd_scores(
                    clean, denoised, self.nfft, self.hop, self.eps,
                    frame_block=self.frame_block,
                    interpret=not self._on_tpu(),
                    denoised_scale="auto",
                )
            }
        scale = jnp.sum(clean * denoised, axis=1, keepdims=True) / (
            jnp.sum(denoised * denoised, axis=1, keepdims=True) + self.eps
        )
        denoised = denoised * scale

        speech = jnp.concatenate([clean, denoised], axis=0)
        # magnitude spectrogram, frames-major: (2B, F_frames, nfft//2+1),
        # computed as MXU matmuls with framing fused away (ops/dft.py).
        # bf16x3 DFT passes: 2.9e-5 rel dev vs the float64 oracle on-chip —
        # 10x tighter than the reference's own published GPU deviation
        # (3e-4, plots/deviations.png) at half the MXU passes of "highest"
        mag = framed_spectrogram(
            speech, self.nfft, self.hop, center=True, power=1.0,
            precision="high",
        )
        c, d = mag[:batch], mag[batch:]

        log_ratio = jnp.log(jnp.square(c) / jnp.square(d + self.eps) + self.eps)
        # reference reduces over freq first (dim=1 of (B, freq, frames) =
        # freq), then over frames; our layout is (B, frames, freq)
        lsd = jnp.mean(
            jnp.sqrt(jnp.mean(log_ratio**self.p, axis=2)), axis=1
        )
        return {"LSD": lsd}
