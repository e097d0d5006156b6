"""Long-audio regime integration tests.

The kernels switch implementation past length thresholds: LSD falls back
from the whole-signal kernel to the frame-blocked kernel past ~66 s
(ops/lsd_fused.py::MAX_WHOLESIG_CHUNKS), and SpeechBERTScore's attention
auto policy switches from einsum to the single-pass sdpa kernel past ~1500
encoder frames (metrics/speechbertscore.py::_resolve_impl). These tests pin
the switchover logic and score continuity on CPU; the FSEM_TEST_TPU=1 run
exercises the compiled kernels on the chip.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import LSD, SpeechBERTScore
from fast_speech_enhancement_metrics_tpu.ops import lsd_fused


def _long_pair(seconds, sr=16000, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    t = int(seconds * sr)
    clean = rng.standard_normal((batch, t)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((batch, t)).astype(np.float32)
    return clean, noisy


def test_lsd_long_audio_takes_framed_path(monkeypatch):
    """Past MAX_WHOLESIG_CHUNKS the dispatcher must select the frame-blocked
    kernel, and its score must equal the whole-signal kernel's on a clip
    that both can evaluate."""
    clean, noisy = _long_pair(4)
    c, d = jnp.asarray(clean), jnp.asarray(noisy)

    called = {}
    real_framed = lsd_fused._lsd_framed

    def spy(*a, **kw):
        called["framed"] = True
        return real_framed(*a, **kw)

    monkeypatch.setattr(lsd_fused, "_lsd_framed", spy)
    # force the long-audio route by shrinking the cutover
    monkeypatch.setattr(lsd_fused, "MAX_WHOLESIG_CHUNKS", 64)
    forced = lsd_fused.lsd_scores(c, d, 512, 256, 1e-8, interpret=True)
    assert called.get("framed"), "long-audio route must use the framed kernel"
    monkeypatch.setattr(lsd_fused, "MAX_WHOLESIG_CHUNKS", 4096)
    whole = lsd_fused.lsd_scores(c, d, 512, 256, 1e-8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(forced), np.asarray(whole), rtol=1e-6, atol=1e-6
    )


def test_sbs_attention_policy_switches_to_sdpa():
    """The auto policy: fused block megakernels at short utterances on the
    default-precision post-LN path (round 5; einsum at higher precisions),
    sdpa past ~1500 frames or the logits HBM bound, flash only past sdpa's
    resident-K/V VMEM range (~20k frames)."""
    if not any(d.platform == "tpu" for d in jax.devices()):
        pytest.skip("policy resolves to einsum off-TPU")
    from fast_speech_enhancement_metrics_tpu.models.hubert import (
        MHUBERT_147_CONFIG,
        init_params,
    )

    m = SpeechBERTScore(
        params=init_params(jax.random.key(0), MHUBERT_147_CONFIG)
    )
    assert m._resolve_impl(16 * 16000, 128) == "block_ffn"
    assert m._resolve_impl(600 * 16000, 4) == "sdpa"
    assert m._resolve_impl(900 * 16000, 4) == "flash"
    m_hi = SpeechBERTScore(params=m.params, precision="highest")
    assert m_hi._resolve_impl(16 * 16000, 128) == "einsum"


@pytest.mark.skipif(
    not os.environ.get("FSEM_TEST_TPU"),
    reason="TPU long-audio integration disabled (set FSEM_TEST_TPU=1)",
)
def test_long_audio_on_tpu():
    """80 s clips through LSD (framed kernel) and SpeechBERTScore (sdpa
    attention + auto row chunking) on the real chip: finite scores, LSD
    framed matches the XLA spectral path."""
    tpu = [d for d in jax.devices() if d.platform == "tpu"][0]
    clean, noisy = _long_pair(80)

    lsd = LSD(device=tpu)
    fused = [r["LSD"] for r in lsd(clean, noisy)]
    xla = [r["LSD"] for r in LSD(device=tpu, spectral_impl="xla")(clean, noisy)]
    np.testing.assert_allclose(fused, xla, rtol=2e-4, atol=2e-4)

    from fast_speech_enhancement_metrics_tpu.models.hubert import (
        MHUBERT_147_CONFIG,
        init_params,
    )

    sbs = SpeechBERTScore(
        params=init_params(jax.random.key(0), MHUBERT_147_CONFIG),
        act_dtype=jnp.bfloat16,
        device=tpu,
    )
    assert sbs._resolve_impl(clean.shape[1], 4) == "sdpa"
    scores = sbs(clean, noisy)
    assert all(np.isfinite(r["SpeechBERTScore"]) for r in scores)


def test_sdr_gram_long_audio_matches_xla():
    """The Gram correlation kernel on an 80 s clip (grid deep in the
    frame-block accumulation regime) vs the XLA overlap-save path."""
    import jax

    from fast_speech_enhancement_metrics_tpu import SDR

    rs = np.random.RandomState(41)
    t = 80 * 16000
    clean = rs.randn(2, t).astype(np.float32)
    noisy = clean + 0.3 * rs.randn(2, t).astype(np.float32)
    xla = np.array([d["SDR"] for d in SDR(corr_impl="xla")(clean, noisy)])
    gram = np.array([d["SDR"] for d in SDR(corr_impl="gram_x4")(clean, noisy)])
    np.testing.assert_allclose(gram, xla, atol=5e-3)
