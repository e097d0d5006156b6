"""STOI/ESTOI agreement vs the float64 ragged oracle
(analogue of tests/reference/test_stoi.py, tolerance abs 5e-4 vs pystoi)."""

import numpy as np

from fast_speech_enhancement_metrics_tpu import STOI
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data
from tests.oracles.dsp import sinc_resample
from tests.oracles.stoi_oracle import stoi_oracle


def test_stoi_agreement_native_rate():
    # feed 10 kHz audio directly so the oracle and metric share the resampler-free path
    speech, noisy, _ = load_audio_data(4, 4, 10000)
    metric = STOI(sample_rate=10000)
    results = metric(speech, noisy)
    expected_stoi, expected_estoi = stoi_oracle(speech, noisy)
    np.testing.assert_allclose(
        [r["STOI"] for r in results], expected_stoi, atol=5e-4
    )
    np.testing.assert_allclose(
        [r["ESTOI"] for r in results], expected_estoi, atol=5e-4
    )


def test_stoi_agreement_16khz(speech_data):
    # 16 kHz inputs exercise the internal 16k->10k resample; oracle resamples
    # with the same float64 kernel math
    metric = STOI(sample_rate=16000)
    results = metric(speech_data["speech"], speech_data["noisy_speech"])
    c10 = sinc_resample(speech_data["speech"].astype(np.float64), 16000, 10000)
    d10 = sinc_resample(speech_data["noisy_speech"].astype(np.float64), 16000, 10000)
    expected_stoi, expected_estoi = stoi_oracle(c10, d10)
    np.testing.assert_allclose(
        [r["STOI"] for r in results], expected_stoi, atol=5e-4
    )
    np.testing.assert_allclose(
        [r["ESTOI"] for r in results], expected_estoi, atol=5e-4
    )


def test_stoi_perfect_and_ordering():
    speech, noisy, _ = load_audio_data(4, 4, 10000)
    metric = STOI(sample_rate=10000)
    same = metric(speech, speech)
    for r in same:
        assert r["STOI"] > 0.999 and r["ESTOI"] > 0.999
    noisy_scores = metric(speech, noisy)
    assert np.mean([r["STOI"] for r in noisy_scores]) < np.mean(
        [r["STOI"] for r in same]
    )


def test_stoi_monotonic_in_snr(high_snr_speech_data, low_snr_speech_data):
    metric = STOI(sample_rate=16000)
    hi = metric(high_snr_speech_data["speech"], high_snr_speech_data["noisy_speech"])
    lo = metric(low_snr_speech_data["speech"], low_snr_speech_data["noisy_speech"])
    for key in ("STOI", "ESTOI"):
        assert np.mean([r[key] for r in hi]) > np.mean([r[key] for r in lo])


def test_framed_rdft_center_half_matches_shift_form():
    """The center-half chunk factorization (ops/dft.py — one windowed
    (hop, 4*n_bins) matmul per chunk, shared by both frames containing it)
    is the same transform as the shift-decomposed framed DFT to fp32
    rounding, for STOI's exact window layout."""
    from fast_speech_enhancement_metrics_tpu.ops.dft import (
        framed_rdft,
        framed_rdft_center_half,
    )

    m = STOI(sample_rate=10000)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 7 * 128 + 512)).astype(np.float32)
    re_a, im_a = framed_rdft(
        x, m.n_fft, m.hop, window=m.stft_window, precision="highest"
    )
    re_b, im_b = framed_rdft_center_half(
        x, m.n_fft, m.hop, window=m.stft_window, precision="highest"
    )
    assert re_a.shape == re_b.shape
    scale = float(np.abs(np.asarray(re_a)).max())
    np.testing.assert_allclose(np.asarray(re_b), np.asarray(re_a), atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(im_b), np.asarray(im_a), atol=2e-5 * scale)


def test_stoi_fused_kernel_matches_xla(speech_data):
    """The fused Pallas segment kernel (ops/stoi_fused.py — sliding segments
    never materialized, lane-shift accumulation in VMEM) matches the XLA
    segment path; interpret mode on CPU, compiled in the FSEM_TEST_TPU=1
    suite. Also must satisfy the float64-oracle contract directly."""
    c = speech_data["speech"][:4]
    d = speech_data["noisy_speech"][:4]
    xla = STOI(sample_rate=16000, segment_impl="xla")(c, d)
    fused = STOI(sample_rate=16000, segment_impl="fused")(c, d)
    for key in ("STOI", "ESTOI"):
        np.testing.assert_allclose(
            [r[key] for r in fused],
            [r[key] for r in xla],
            atol=2e-5,
        )
    c10 = sinc_resample(c.astype(np.float64), 16000, 10000)
    d10 = sinc_resample(d.astype(np.float64), 16000, 10000)
    expected_stoi, expected_estoi = stoi_oracle(c10, d10)
    np.testing.assert_allclose([r["STOI"] for r in fused], expected_stoi, atol=5e-4)
    np.testing.assert_allclose([r["ESTOI"] for r in fused], expected_estoi, atol=5e-4)
