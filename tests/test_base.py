"""Base runtime API contract (reference: fast_se_metrics/base.py behaviors)."""

import numpy as np
import pytest
import torch

from fast_speech_enhancement_metrics_tpu import LSD, SDR


def test_torch_tensor_inputs(speech_data):
    metric = LSD()
    from_numpy = metric(speech_data["speech"], speech_data["noisy_speech"])
    from_torch = metric(
        torch.tensor(speech_data["speech"]), torch.tensor(speech_data["noisy_speech"])
    )
    for a, b in zip(from_numpy, from_torch):
        assert a["LSD"] == pytest.approx(b["LSD"], rel=1e-6)


def test_1d_input_returns_single_result(speech_data):
    metric = LSD()
    results = metric(speech_data["speech"][0], speech_data["noisy_speech"][0])
    assert len(results) == 1
    assert isinstance(results[0]["LSD"], float)


def test_mismatched_shapes_raise():
    metric = LSD()
    with pytest.raises(ValueError, match="same shape"):
        metric(np.zeros((2, 1000), np.float32), np.zeros((2, 999), np.float32))


def test_3d_input_raises():
    metric = LSD()
    with pytest.raises(ValueError, match="1-D or 2-D"):
        metric(np.zeros((1, 2, 100), np.float32), np.zeros((1, 2, 100), np.float32))


def test_resample_path_matches_native_rate(speech_data):
    """Passing 48 kHz audio must equal resampling to 16 kHz manually."""
    from fast_speech_enhancement_metrics_tpu.ops.resample import resample

    clean48 = np.repeat(speech_data["speech"], 3, axis=1)  # crude 48k stand-in
    noisy48 = np.repeat(speech_data["noisy_speech"], 3, axis=1)

    via_metric = SDR(sample_rate=48000)(clean48, noisy48)
    manual = SDR()(
        np.asarray(resample(clean48, 48000, 16000)),
        np.asarray(resample(noisy48, 48000, 16000)),
    )
    for a, b in zip(via_metric, manual):
        assert a["SDR"] == pytest.approx(b["SDR"], abs=1e-3)


def test_sdr_self_reference_saturates(speech_data):
    """SDR(c, c) saturates at the solve's self-coherence resolution: ~80 dB
    (1e-8 clamp ceiling) on the fp32 DFT paths, ~56 dB on the default
    bf16-hi/lo Gram path (the x3 split's ~2.5e-6 coherence residual). Either
    way: a perfect-match sentinel far above any physical score."""
    results = SDR()(speech_data["speech"], speech_data["speech"])
    for r in results:
        assert r["SDR"] > 40.0


def test_ragged_lengths_match_per_utterance_calls():
    """Variable-length list inputs route to the ragged path and match
    per-utterance calls (a capability the reference's fixed-(B, T) API
    lacks — unequal lengths raise there). No padding reaches any metric, so
    the only differences are batch-size-dependent XLA fusion/reassociation
    (the same differences any batched call has vs batch 1)."""
    from fast_speech_enhancement_metrics_tpu import LSD, SDR

    rs = np.random.RandomState(33)
    lens = [16000, 24000, 16000, 9137]
    clean = [rs.randn(t).astype(np.float32) for t in lens]
    noisy = [c + 0.3 * rs.randn(len(c)).astype(np.float32) for c in clean]

    for metric in (LSD(), SDR()):
        ragged = metric(clean, noisy)
        assert len(ragged) == len(lens)
        for i, (c, d) in enumerate(zip(clean, noisy)):
            single = metric(c, d)[0]
            for k, v in single.items():
                assert ragged[i][k] == pytest.approx(v, rel=1e-4, abs=1e-3)


def test_ragged_equal_lengths_take_batched_path():
    from fast_speech_enhancement_metrics_tpu import LSD
    from fast_speech_enhancement_metrics_tpu.base import _is_ragged

    rs = np.random.RandomState(34)
    clean = [rs.randn(16000).astype(np.float32) for _ in range(3)]
    noisy = [c + 0.1 * rs.randn(16000).astype(np.float32) for c in clean]
    assert not _is_ragged(noisy)
    out = LSD()(clean, noisy)
    assert len(out) == 3
