"""Placeholder — implemented in a later milestone this round."""

from fast_speech_enhancement_metrics_tpu.base import BaseMetric


class SpeechBERTScore(BaseMetric):
    higher_is_better = True
    EXPECTED_SAMPLING_RATE = 16000

    def _compute(self, clean, denoised):
        raise NotImplementedError("SpeechBERTScore is not implemented yet")
