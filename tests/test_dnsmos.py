"""DNSMOS agreement vs float64 torch oracle (analogue of tests/reference/test_dnsmos.py)."""

import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import DNSMOS
from tests.oracles.dnsmos_oracle import dnsmos_oracle


@pytest.fixture(scope="module")
def oracle_scores(speech_data):
    return dnsmos_oracle(speech_data["noisy_speech"])


def test_dnsmos_agreement(speech_data, oracle_scores):
    metric = DNSMOS()
    results = metric(None, speech_data["noisy_speech"])
    for key in ("SIG", "BAK", "OVRL"):
        ours = np.array([r[key] for r in results])
        np.testing.assert_allclose(ours, oracle_scores[key], atol=5e-4, err_msg=key)


def test_dnsmos_ignores_clean(speech_data):
    metric = DNSMOS()
    with_clean = metric(speech_data["speech"], speech_data["noisy_speech"])
    without = metric(None, speech_data["noisy_speech"])
    for a, b in zip(with_clean, without):
        assert a == b


def test_dnsmos_high_vs_low_snr(high_snr_speech_data, low_snr_speech_data):
    metric = DNSMOS()
    high = metric(None, high_snr_speech_data["noisy_speech"])
    low = metric(None, low_snr_speech_data["noisy_speech"])
    for key in ("BAK", "OVRL"):
        assert np.mean([r[key] for r in high]) > np.mean([r[key] for r in low])


def test_dnsmos_segment_chunking_exact(speech_data):
    """lax.map chunking is a memory optimization — results must be identical."""
    full = DNSMOS(window_plan="per_window")(None, speech_data["noisy_speech"])
    chunked = DNSMOS(window_plan="per_window", segment_chunk=16)(
        None, speech_data["noisy_speech"]
    )
    assert full == chunked


def test_dnsmos_host_chunking_matches(speech_data):
    """Python-loop chunking over a per-chunk jitted net == one fused graph."""
    full = DNSMOS()(None, speech_data["noisy_speech"])
    host = DNSMOS(host_chunk=16)(None, speech_data["noisy_speech"])
    for a, b in zip(full, host):
        for key in a:
            assert a[key] == pytest.approx(b[key], abs=1e-5), key


@pytest.mark.parametrize("duration_s", [4, 10, 16])
def test_dnsmos_shared_exact_equals_per_window(duration_s):
    """The default shared_exact plan (conv trunk shared across windows +
    per-window edge strips, models/dnsmos_net.py::dnsmos_net_windowed_exact)
    must reproduce the per-window plan exactly — the boundary cells are
    recomputed with the per-window zero padding, so the only difference is
    float reassociation (measured 0.0 at fp32 on CPU)."""
    from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

    _, noisy, _ = load_audio_data(duration_s, 3, 16000)
    exact = DNSMOS(window_plan="per_window", precision="highest")(None, noisy)
    fast = DNSMOS(window_plan="shared_exact", precision="highest")(None, noisy)
    for a, b in zip(exact, fast):
        for key in a:
            assert a[key] == pytest.approx(b[key], abs=1e-5), key


def test_dnsmos_shared_exact_host_chunk_matches(speech_data):
    """shared_exact through the host-chunked execution plan == in-graph."""
    full = DNSMOS(precision="highest")(None, speech_data["noisy_speech"])
    host = DNSMOS(precision="highest", host_chunk=4)(
        None, speech_data["noisy_speech"]
    )
    for a, b in zip(full, host):
        for key in a:
            assert a[key] == pytest.approx(b[key], abs=1e-5), key


def test_dnsmos_shared_conv_close(speech_data):
    """Shared-conv fast path: conv stack computed once over the full signal.
    Deviates from exact per-window semantics only through window-boundary
    context (the exact mode zero-pads each window). Bound: the
    duration x SNR characterization sweep measured max 0.083/0.100/0.051
    SIG/BAK/OVRL (results/dnsmos_deviation.md); this fixture asserts inside
    that envelope with headroom."""
    exact = DNSMOS()(None, speech_data["noisy_speech"])
    shared = DNSMOS(host_chunk=4, shared_conv=True)(
        None, speech_data["noisy_speech"]
    )
    for a, b in zip(exact, shared):
        for key in a:
            assert a[key] == pytest.approx(b[key], abs=0.12), key


def test_dnsmos_bf16_convs_in_reference_fp16_class(speech_data):
    """conv_dtype=bfloat16 (the benchmark default) must stay in the
    reference's own reduced-precision deviation class: the sweep in
    results/dnsmos_deviation.md measured max 0.022/0.016/0.008 SIG/BAK/OVRL
    vs exact fp32 (reference's published fp16-vs-ONNX deviation: 6e-3)."""
    import jax.numpy as jnp

    exact = DNSMOS(precision="highest")(None, speech_data["noisy_speech"])
    fast = DNSMOS(conv_dtype=jnp.bfloat16)(None, speech_data["noisy_speech"])
    for a, b in zip(exact, fast):
        assert a["SIG"] == pytest.approx(b["SIG"], abs=0.04)
        assert a["BAK"] == pytest.approx(b["BAK"], abs=0.04)
        assert a["OVRL"] == pytest.approx(b["OVRL"], abs=0.02)


def test_dnsmos_range(speech_data):
    metric = DNSMOS()
    for r in metric(None, speech_data["noisy_speech"]):
        for key in ("SIG", "BAK", "OVRL"):
            assert 1.0 <= r[key] <= 5.0


def test_dnsmos_shared_exact_batch_chunking():
    """The shared_exact auto batch-chunk (large-batch HBM cap) must not
    change scores: forced tiny chunks vs the fused single-graph path."""
    import jax.numpy as jnp

    rs = np.random.RandomState(9)
    noisy = (0.1 * rs.randn(12, 160000)).astype(np.float32)
    fused = DNSMOS(conv_dtype=jnp.bfloat16)(None, noisy)
    chunky = DNSMOS(conv_dtype=jnp.bfloat16)
    chunky.shared_chunk_gb = 1e-3  # force the lax.map row-chunk path
    chunked = chunky(None, noisy)
    for a, b in zip(fused, chunked):
        for k in ("SIG", "BAK", "OVRL"):
            assert a[k] == pytest.approx(b[k], abs=5e-5)
