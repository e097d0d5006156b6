"""SNR-monotonicity property test for every implemented metric.

Analogue of the reference's model-free sanity check
(reference: tests/test_high_vs_low_snr.py:8-26): every metric must score
+10 dB SNR mixtures better than -5 dB mixtures, in the direction of
``higher_is_better``.
"""

import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import LSD, PESQ, SDR, STOI

METRICS = [PESQ, STOI, SDR, LSD]


@pytest.mark.parametrize("metric_cls", METRICS)
def test_high_vs_low_snr(metric_cls, high_snr_speech_data, low_snr_speech_data):
    metric = metric_cls()
    high = metric(
        high_snr_speech_data["speech"], high_snr_speech_data["noisy_speech"]
    )
    low = metric(
        low_snr_speech_data["speech"], low_snr_speech_data["noisy_speech"]
    )
    for key in high[0]:
        high_mean = np.mean([r[key] for r in high])
        low_mean = np.mean([r[key] for r in low])
        if metric.higher_is_better:
            assert high_mean > low_mean, key
        else:
            assert high_mean < low_mean, key
