"""Placeholder — implemented in a later milestone this round."""

from fast_speech_enhancement_metrics_tpu.base import BaseMetric


class STOI(BaseMetric):
    higher_is_better = True
    EXPECTED_SAMPLING_RATE = 16000

    def _compute(self, clean, denoised):
        raise NotImplementedError("STOI is not implemented yet")
