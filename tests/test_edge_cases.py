"""Edge cases the reference only partially covers."""

import warnings

import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import LSD, PESQ, SDR, STOI


def test_stoi_all_silent_warns_and_returns_zero():
    """All-silent clean signal -> no voiced frames -> warning + 0 score
    (reference: fast_se_metrics/STOI.py:163-165)."""
    silent = np.zeros((2, 40000), dtype=np.float32)
    noise = np.random.RandomState(0).randn(2, 40000).astype(np.float32) * 1e-8
    metric = STOI(sample_rate=16000)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # silent input hits guarded paths
        results = metric(silent + 1e-10, noise)
    for r in results:
        assert np.isfinite(r["STOI"]) and np.isfinite(r["ESTOI"])


def test_stoi_mostly_silent_long_input_warns_and_returns_zero():
    """A long input whose silent-frame removal leaves too few frames for even
    one 30-frame segment must score exactly 0.0 with the reference's runtime
    warning (fast_se_metrics/STOI.py:163-165) — the *dynamic* contract, which
    the static input-length guard cannot catch."""
    rng = np.random.RandomState(3)
    # one loud burst, everything else 120 dB quieter -> only a handful of
    # frames survive the 40 dB dynamic-range cut
    clean = np.full((2, 160000), 1e-7, dtype=np.float32)
    clean[:, :2000] = rng.randn(2, 2000).astype(np.float32)
    noisy = clean + 1e-9 * rng.randn(2, 160000).astype(np.float32)
    metric = STOI(sample_rate=16000)
    with pytest.warns(RuntimeWarning, match="non-silent"):
        results = metric(clean, noisy)
    for r in results:
        assert r["STOI"] == 0.0
        assert r["ESTOI"] == 0.0


def test_bark_interp_matches_scipy():
    """interp_table must match the reference's scipy interp1d resampling."""
    from scipy import interpolate

    from fast_speech_enhancement_metrics_tpu.ops.bark import (
        ABS_THRESH_POWER_16K,
        interp_table,
    )

    for nbarks in (24, 36, 49):
        ours = interp_table(ABS_THRESH_POWER_16K, nbarks)
        f = interpolate.interp1d(np.arange(49), ABS_THRESH_POWER_16K)
        expected = f(np.linspace(0, 49.0, nbarks, endpoint=False))
        np.testing.assert_allclose(ours, expected, rtol=1e-12)


def test_metrics_handle_short_audio():
    """1-second clips must not crash any DSP metric."""
    rng = np.random.RandomState(1)
    clean = rng.randn(2, 16000).astype(np.float32) * 0.1
    noisy = clean + 0.02 * rng.randn(2, 16000).astype(np.float32)
    for metric in (PESQ(), STOI(sample_rate=16000), SDR(), LSD()):
        results = metric(clean, noisy)
        assert len(results) == 2
        for r in results:
            for v in r.values():
                assert np.isfinite(v)


def test_pesq_scores_degrade_with_noise():
    rng = np.random.RandomState(2)
    clean = np.sin(2 * np.pi * 220 * np.arange(32000) / 16000).astype(np.float32)
    clean = np.tile(clean, (2, 1)) * 0.5
    light = clean + 0.01 * rng.randn(*clean.shape).astype(np.float32)
    heavy = clean + 0.3 * rng.randn(*clean.shape).astype(np.float32)
    metric = PESQ()
    light_scores = [r["PESQ"] for r in metric(clean, light)]
    heavy_scores = [r["PESQ"] for r in metric(clean, heavy)]
    assert np.mean(light_scores) > np.mean(heavy_scores)
