"""PESQ agreement vs float64 SciPy oracle (analogue of tests/reference/test_pesq.py)."""

import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import PESQ
from tests.oracles.pesq_oracle import pesq_oracle


def test_pesq_agreement(speech_data):
    metric = PESQ()
    results = metric(speech_data["speech"], speech_data["noisy_speech"])
    ours = np.array([r["PESQ"] for r in results])
    expected = pesq_oracle(speech_data["speech"], speech_data["noisy_speech"])
    # the reference's own fp32-GPU-vs-reference deviation is 5e-3
    np.testing.assert_allclose(ours, expected, atol=5e-3)


def test_pesq_identical_inputs(speech_data):
    metric = PESQ()
    results = metric(speech_data["speech"], speech_data["speech"])
    for r in results:
        assert r["PESQ"] > 4.0  # clean-vs-clean must score near the 4.55 ceiling


def test_pesq_range(speech_data):
    metric = PESQ()
    results = metric(speech_data["speech"], speech_data["noisy_speech"])
    for r in results:
        assert 0.99 < r["PESQ"] < 4.56


def test_pesq_single_utterance(speech_data):
    metric = PESQ()
    results = metric(speech_data["speech"][0], speech_data["noisy_speech"][0])
    assert len(results) == 1
    expected = pesq_oracle(
        speech_data["speech"][:1], speech_data["noisy_speech"][:1]
    )
    assert results[0]["PESQ"] == pytest.approx(float(expected[0]), abs=5e-3)
