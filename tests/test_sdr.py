"""SDR agreement vs float64 SciPy Toeplitz oracle (analogue of tests/reference/test_sdr.py,
reference tolerance abs=1e-2 vs TorchMetrics)."""

import numpy as np

from fast_speech_enhancement_metrics_tpu import SDR
from tests.oracles.sdr_oracle import sdr_oracle


def test_sdr_agreement(speech_data):
    metric = SDR()
    results = metric(speech_data["speech"], speech_data["noisy_speech"])
    ours = np.array([r["SDR"] for r in results])
    expected = sdr_oracle(speech_data["speech"], speech_data["noisy_speech"])
    np.testing.assert_allclose(ours, expected, atol=1e-2)


def test_sdr_monotonic_in_snr(high_snr_speech_data, low_snr_speech_data):
    metric = SDR()
    hi = metric(high_snr_speech_data["speech"], high_snr_speech_data["noisy_speech"])
    lo = metric(low_snr_speech_data["speech"], low_snr_speech_data["noisy_speech"])
    assert np.mean([r["SDR"] for r in hi]) > np.mean([r["SDR"] for r in lo])
