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


def test_pesq_time_align_shift_invariance(speech_data):
    """PESQ(time_align=True) must undo a constant injected delay that
    wrecks the unaligned score (the reference skips time alignment
    entirely — fast_se_metrics/PESQ.py:19-24; this opt-in covers the
    constant-delay case)."""
    clean = np.asarray(speech_data["speech"])[:2]
    noisy = np.asarray(speech_data["noisy_speech"])[:2]
    shift = 1200  # 75 ms at 16 kHz, inside the ±100 ms search window
    delayed = np.concatenate([np.zeros_like(noisy[:, :shift]), noisy[:, :-shift]], axis=1)
    advanced = np.concatenate([noisy[:, shift:], np.zeros_like(noisy[:, :shift])], axis=1)

    base = np.array([r["PESQ"] for r in PESQ()(clean, noisy)])
    broken = np.array([r["PESQ"] for r in PESQ()(clean, delayed)])
    aligned = PESQ(time_align=True)
    fixed_d = np.array([r["PESQ"] for r in aligned(clean, delayed)])
    fixed_a = np.array([r["PESQ"] for r in aligned(clean, advanced)])
    same = np.array([r["PESQ"] for r in aligned(clean, noisy)])

    # the unaligned metric collapses under the shift (asserted on the
    # high-SNR utterance — the low-SNR one already sits near the 1.0
    # floor); the aligned one recovers the unshifted score up to the
    # zero-filled 75 ms tail
    assert broken[0] < base[0] - 0.5
    np.testing.assert_allclose(fixed_d, base, atol=0.1)
    # the advanced case loses the utterance's first 75 ms outright (the
    # aligned signal starts with silence) — a real information loss the
    # alignment cannot recover, so the band is wider
    np.testing.assert_allclose(fixed_a, base, atol=0.25)
    # zero injected delay -> the aligned path reproduces the default
    np.testing.assert_allclose(same, base, atol=1e-5)
