"""LSD agreement vs float64 NumPy oracle (analogue of tests/reference/test_lsd.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import LSD
from tests.oracles.lsd_oracle import lsd_oracle


def test_lsd_agreement(speech_data):
    metric = LSD()
    results = metric(speech_data["speech"], speech_data["noisy_speech"])
    ours = np.array([r["LSD"] for r in results])
    expected = lsd_oracle(speech_data["speech"], speech_data["noisy_speech"])
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)


def test_lsd_identical_inputs(speech_data):
    # Note: LSD(c, c) is not 0 under the urgent2025 recipe — exactly-silent
    # frames contribute log(eps)^2 — but it must agree with the oracle and be
    # strictly better (lower) than LSD against the noisy signal.
    metric = LSD()
    same = metric(speech_data["speech"], speech_data["speech"])
    ours = np.array([r["LSD"] for r in same])
    expected = lsd_oracle(speech_data["speech"], speech_data["speech"])
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)

    noisy = metric(speech_data["speech"], speech_data["noisy_speech"])
    assert all(s["LSD"] < n["LSD"] for s, n in zip(same, noisy))


def test_lsd_single_utterance(speech_data):
    metric = LSD()
    results = metric(speech_data["speech"][0], speech_data["noisy_speech"][0])
    assert len(results) == 1
    expected = lsd_oracle(
        speech_data["speech"][:1], speech_data["noisy_speech"][:1]
    )
    assert results[0]["LSD"] == pytest.approx(float(expected[0]), rel=2e-4, abs=2e-4)


def test_lsd_fused_kernel_matches_xla(speech_data):
    """The fused Pallas kernel (ops/lsd_fused.py — shared-chunk DFT +
    frequency-domain Hann + in-VMEM reduction) matches the XLA path and the
    oracle; runs in interpret mode on CPU, compiled in the FSEM_TEST_TPU=1
    device-consistency matrix."""
    xla = LSD(spectral_impl="xla")(speech_data["speech"], speech_data["noisy_speech"])
    fused = LSD(spectral_impl="fused")(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    # both paths are bf16x3-class DFTs with different rounding orders; they
    # agree with each other at the same class they agree with the oracle
    np.testing.assert_allclose(
        [r["LSD"] for r in xla], [r["LSD"] for r in fused], rtol=2e-4, atol=2e-4
    )
    expected = lsd_oracle(speech_data["speech"], speech_data["noisy_speech"])
    np.testing.assert_allclose(
        [r["LSD"] for r in fused], expected, rtol=2e-4, atol=2e-4
    )



def test_lsd_framed_matches_wholesig(speech_data):
    """The long-audio frame-blocked kernel and the whole-signal kernel
    compute identical scores (same math, different grid partition); clips
    past ~66 s take the framed path automatically (ops/lsd_fused.py)."""
    from fast_speech_enhancement_metrics_tpu.ops import lsd_fused

    c = jnp.asarray(speech_data["speech"][:2], dtype=jnp.float32)
    d = jnp.asarray(speech_data["noisy_speech"][:2], dtype=jnp.float32)
    ws = lsd_fused._lsd_wholesig(c, d, 512, 256, 1e-8, "high", True)
    fr = lsd_fused._lsd_framed(c, d, 512, 256, 1e-8, 256, "high", True)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(fr), rtol=1e-6, atol=1e-6)


def test_lsd_raw_zero_copy_matches_padded(speech_data):
    """The zero-copy raw-chunk whole-signal kernel (scale applied in VMEM,
    no padded (B, T) copies) computes the same scores as the padded
    whole-signal kernel; its alignment gate requires T % (8*hop) == 0."""
    from fast_speech_enhancement_metrics_tpu.ops import lsd_fused

    t = 248 * 256  # nc = 248: hop-aligned and 8-row aligned
    c = jnp.asarray(speech_data["speech"][:2, :t], dtype=jnp.float32)
    d = jnp.asarray(speech_data["noisy_speech"][:2, :t], dtype=jnp.float32)
    scale = jnp.asarray([0.9, 1.2], dtype=jnp.float32)
    raw = lsd_fused._lsd_wholesig_raw(c, d, scale, 256, 1e-8, "high", True)
    padded = lsd_fused._lsd_wholesig(
        c, d * scale[:, None], 512, 256, 1e-8, "high", True
    )
    np.testing.assert_allclose(np.asarray(raw), np.asarray(padded), rtol=1e-6)

    # and the dispatcher routes aligned shapes to the raw kernel's result
    via_scores = lsd_fused.lsd_scores(
        c, d, 512, 256, 1e-8, interpret=True, denoised_scale=scale
    )
    np.testing.assert_allclose(np.asarray(via_scores), np.asarray(raw), rtol=1e-7)

    # unaligned shapes (nc % 8 != 0) fall back and still agree
    t2 = 250 * 256
    c2 = jnp.asarray(speech_data["speech"][:2, :t2], dtype=jnp.float32)
    d2 = jnp.asarray(speech_data["noisy_speech"][:2, :t2], dtype=jnp.float32)
    fb = lsd_fused.lsd_scores(
        c2, d2, 512, 256, 1e-8, interpret=True, denoised_scale=scale
    )
    pad2 = lsd_fused._lsd_wholesig(
        c2, d2 * scale[:, None], 512, 256, 1e-8, "high", True
    )
    np.testing.assert_allclose(np.asarray(fb), np.asarray(pad2), rtol=1e-6)


def test_ct_and_rows_variants_match_dense(speech_data):
    """Round-5 variants: the factorized (Cooley-Tukey) chunk DFT and the
    rows_per_step batched grid must reproduce the dense kernel's scores
    (both are measured performance negatives — tools/prof_lsd_ct.py — kept
    as recorded A/Bs; this pins their correctness)."""
    from fast_speech_enhancement_metrics_tpu.ops import lsd_fused

    t = 248 * 256
    c = jnp.asarray(speech_data["speech"][:4, :t], dtype=jnp.float32)
    d = jnp.asarray(speech_data["noisy_speech"][:4, :t], dtype=jnp.float32)
    dense = lsd_fused.lsd_scores(
        c, d, 512, 256, 1e-8, interpret=True, denoised_scale="auto"
    )
    ct = lsd_fused.lsd_scores(
        c, d, 512, 256, 1e-8, interpret=True, denoised_scale="auto",
        dft_impl="ct",
    )
    # CT folds add fp32 twiddle rounding: ~3e-5 rel on speech fixtures
    np.testing.assert_allclose(np.asarray(ct), np.asarray(dense), rtol=1e-4)
    for rows in (2, 4):
        rr = lsd_fused.lsd_scores(
            c, d, 512, 256, 1e-8, interpret=True, denoised_scale="auto",
            rows_per_step=rows,
        )
        np.testing.assert_allclose(np.asarray(rr), np.asarray(dense), atol=1e-6)
