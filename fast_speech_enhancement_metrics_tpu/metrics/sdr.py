"""SDR (signal-to-distortion ratio) via Toeplitz least squares, TPU-native.

Behavioral contract (reference: fast_se_metrics/SDR.py:52-97, the Scheibler
fast-SDR formulation as in TorchMetrics):

* L2-normalize both signals (clamped at 1e-6),
* auto/cross-correlation through length-padded rFFTs (next power of two),
* solve the 512-tap symmetric Toeplitz normal equations,
* SDR = 10*log10(coh / (1 - coh)) with 1e-8 floors.

TPU design: the two rFFTs ride one doubled batch axis; the Toeplitz solve is a
batched Cholesky (see ops/toeplitz.py). Everything is one jitted graph, fp32.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from fast_speech_enhancement_metrics_tpu.base import BaseMetric
from fast_speech_enhancement_metrics_tpu.ops.toeplitz import symmetric_toeplitz_solve


class SDR(BaseMetric):
    higher_is_better = True
    EXPECTED_SAMPLING_RATE = 16000

    def __init__(self, sample_rate: int = 16000, **kw):
        super().__init__(sample_rate, **kw)
        self.filter_length = 512
        self.zero_mean = False
        self.load_diag = None

    def _preprocess(self, speech):
        speech = speech.astype(jnp.float32)
        if self.zero_mean:
            speech = speech - jnp.mean(speech, axis=-1, keepdims=True)
        norm = jnp.clip(
            jnp.linalg.norm(speech, axis=-1, keepdims=True), min=1e-6
        )
        return speech / norm

    def _compute(self, clean, denoised):
        assert clean is not None
        batch = clean.shape[0]
        corr_len = self.filter_length

        speech = jnp.concatenate(
            [self._preprocess(clean), self._preprocess(denoised)], axis=0
        )
        n_fft = 2 ** math.ceil(math.log2(2 * clean.shape[-1] - 1))
        ffts = jnp.fft.rfft(speech, n=n_fft, axis=-1)
        t_fft, p_fft = ffts[:batch], ffts[batch:]

        # autocorrelation of clean (first Toeplitz row) + cross-correlation
        r0 = jnp.fft.irfft(jnp.abs(t_fft) ** 2, n=n_fft)[..., :corr_len]
        b = jnp.fft.irfft(jnp.conj(t_fft) * p_fft, n=n_fft)[..., :corr_len]
        r0 = r0.astype(jnp.float32)
        b = b.astype(jnp.float32)

        if self.load_diag is not None:
            r0 = r0.at[..., 0].add(self.load_diag)

        sol = symmetric_toeplitz_solve(r0, b)
        coh = jnp.einsum("...l,...l->...", b, sol, precision="highest")

        ratio = coh / jnp.clip(1.0 - coh, min=1e-8)
        sdr = 10.0 * jnp.log10(jnp.clip(ratio, min=1e-8))
        return {"SDR": sdr}
