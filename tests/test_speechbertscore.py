"""HuBERT architecture parity vs HF ``transformers`` + SpeechBERTScore math.

The real mHuBERT-147 weights cannot be downloaded in a zero-egress
environment, so parity is proven structurally: random-initialized HF
``HubertModel``s (both positional-conv parametrizations) are converted through
``convert_hf_hubert`` and must reproduce ``hidden_states[L]`` to fp32
tolerance. The F1 aggregation is checked against a float64 NumPy oracle.
"""

import numpy as np
import pytest
import torch

from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    HubertConfig,
    convert_hf_hubert,
    hubert_hidden_state,
)

SMALL = dict(
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=96,
    conv_dim=(32, 32, 32),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def _hf_model(**overrides):
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel

    torch.manual_seed(0)
    cfg = HFConfig(**{**SMALL, **overrides})
    model = HubertModel(cfg)
    model.eval()
    return model, cfg


def _our_config(cfg) -> HubertConfig:
    from fast_speech_enhancement_metrics_tpu.utils.convert_hubert import config_from_hf

    return config_from_hf(cfg)


@pytest.mark.parametrize("layer", [0, 2, 3])
def test_hubert_parity_weight_norm(layer):
    model, cfg = _hf_model()
    audio = np.random.RandomState(1).randn(2, 8000).astype(np.float32)

    with torch.no_grad():
        expected = (
            model(torch.tensor(audio), output_hidden_states=True)
            .hidden_states[layer]
            .numpy()
        )

    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    ours = np.asarray(
        hubert_hidden_state(params, audio, _our_config(cfg), output_layer=layer)
    )
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_hubert_parity_large_style():
    """hubert-large architecture class: layer-norm feature extractor,
    conv bias, pre-LN (stable) encoder layers."""
    model, cfg = _hf_model(
        feat_extract_norm="layer", conv_bias=True, do_stable_layer_norm=True
    )
    audio = np.random.RandomState(7).randn(2, 8000).astype(np.float32)
    with torch.no_grad():
        expected = (
            model(torch.tensor(audio), output_hidden_states=True)
            .hidden_states[3]
            .numpy()
        )
    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    ours = np.asarray(
        hubert_hidden_state(params, audio, _our_config(cfg), output_layer=3)
    )
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_hubert_parity_batch_norm_pos_conv():
    model, cfg = _hf_model(conv_pos_batch_norm=True)
    # give the BN non-trivial running statistics so folding is exercised
    bn = model.encoder.pos_conv_embed.batch_norm
    gen = torch.Generator().manual_seed(3)
    bn.running_mean.copy_(torch.randn(bn.running_mean.shape, generator=gen) * 0.3)
    bn.running_var.copy_(torch.rand(bn.running_var.shape, generator=gen) + 0.5)

    audio = np.random.RandomState(2).randn(2, 8000).astype(np.float32)
    with torch.no_grad():
        expected = (
            model(torch.tensor(audio), output_hidden_states=True)
            .hidden_states[3]
            .numpy()
        )
    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    ours = np.asarray(
        hubert_hidden_state(params, audio, _our_config(cfg), output_layer=3)
    )
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def _f1_oracle(clean_emb, denoised_emb):
    out = []
    for c, d in zip(clean_emb.astype(np.float64), denoised_emb.astype(np.float64)):
        sim = (d @ c.T) / (
            np.linalg.norm(d, axis=1, keepdims=True) * np.linalg.norm(c, axis=1)
        )
        precision = sim.max(axis=1).mean()
        recall = sim.max(axis=0).mean()
        out.append(2 * precision * recall / (precision + recall))
    return np.array(out)


def test_speechbertscore_metric(speech_data):
    model, cfg = _hf_model()
    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    metric = SpeechBERTScore(
        params=params, config=_our_config(cfg), output_layer=3
    )
    results = metric(speech_data["speech"], speech_data["noisy_speech"])
    ours = np.array([r["SpeechBERTScore"] for r in results])

    with torch.no_grad():
        ce = (
            model(torch.tensor(speech_data["speech"]), output_hidden_states=True)
            .hidden_states[3]
            .numpy()
        )
        de = (
            model(
                torch.tensor(speech_data["noisy_speech"]), output_hidden_states=True
            )
            .hidden_states[3]
            .numpy()
        )
    expected = _f1_oracle(ce, de)
    np.testing.assert_allclose(ours, expected, atol=1e-4)
    assert np.all(ours <= 1.0)


def test_speechbertscore_batch_chunking_exact(speech_data):
    model, cfg = _hf_model()
    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    kw = dict(params=params, config=_our_config(cfg), output_layer=3)
    full = SpeechBERTScore(**kw)(speech_data["speech"], speech_data["noisy_speech"])
    chunked = SpeechBERTScore(batch_chunk=2, **kw)(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    for a, b in zip(full, chunked):
        assert a["SpeechBERTScore"] == pytest.approx(
            b["SpeechBERTScore"], abs=1e-6
        )


def test_speechbertscore_host_chunking_matches(speech_data):
    model, cfg = _hf_model()
    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    kw = dict(params=params, config=_our_config(cfg), output_layer=3)
    full = SpeechBERTScore(**kw)(speech_data["speech"], speech_data["noisy_speech"])
    host = SpeechBERTScore(host_chunk=2, **kw)(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    for a, b in zip(full, host):
        assert a["SpeechBERTScore"] == pytest.approx(
            b["SpeechBERTScore"], abs=1e-6
        )


def test_speechbertscore_bf16_activations_close(speech_data):
    """act_dtype=bfloat16 (the benchmark configuration) stores the encoder's
    activation stream in bf16 — the TPU analogue of the reference's fp16
    autocast (fast_se_metrics/SpeechBERTScore.py:8). On-chip F1 deviation vs
    fp32 activations measured 2.2e-3 vs 2.0e-3 for bf16-MXU-passes alone
    (64 x 16 s fixture); this small fixture asserts the same class."""
    import jax.numpy as jnp

    model, cfg = _hf_model()
    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    kw = dict(params=params, config=_our_config(cfg), output_layer=3)
    exact = SpeechBERTScore(precision="highest", **kw)(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    fast = SpeechBERTScore(act_dtype=jnp.bfloat16, **kw)(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    for a, b in zip(exact, fast):
        assert a["SpeechBERTScore"] == pytest.approx(
            b["SpeechBERTScore"], abs=1e-2
        )


def test_speechbertscore_identical_is_one(speech_data):
    model, cfg = _hf_model()
    params = convert_hf_hubert(model.state_dict(), _our_config(cfg))
    metric = SpeechBERTScore(params=params, config=_our_config(cfg), output_layer=3)
    results = metric(speech_data["speech"], speech_data["speech"])
    for r in results:
        assert r["SpeechBERTScore"] == pytest.approx(1.0, abs=1e-5)


def test_gelu_tanh_deviation_within_bf16_class(speech_data):
    """gelu="tanh" (the fast VPU path) must stay within the same F1
    deviation class as the already-characterized bf16 activation stream
    (the reference's own fp16-autocast class). fp32 erf is the truth."""
    import jax

    from fast_speech_enhancement_metrics_tpu.models.hubert import (
        MHUBERT_147_CONFIG,
        init_params,
    )

    params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)
    clean = speech_data["speech"][:2]
    noisy = speech_data["noisy_speech"][:2]
    truth = SpeechBERTScore(params=params, precision="highest")(clean, noisy)
    tanh = SpeechBERTScore(params=params, precision="highest", gelu="tanh")(
        clean, noisy
    )
    dev = max(
        abs(a["SpeechBERTScore"] - b["SpeechBERTScore"])
        for a, b in zip(truth, tanh)
    )
    assert dev < 2e-3, dev  # bf16-act measured ~6e-4 on the same fixture


def test_sdpa_inherits_softmax_mode_and_rejects_unknown_impl():
    """Regression (round-4 review): the sdpa attention path must inherit the
    caller's exact/exp2 softmax mode rather than silently overriding it, and
    unknown 'sdpa*' impl strings must raise instead of defaulting to the
    lowest-fidelity kernel mode."""
    import jax
    import jax.numpy as jnp

    from fast_speech_enhancement_metrics_tpu.models.hubert import _attention

    rs = np.random.RandomState(5)
    d = 64
    p = {
        "q_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "q_b": jnp.zeros(d), "k_b": jnp.zeros(d), "v_b": jnp.zeros(d),
        "k_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "v_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "o_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "o_b": jnp.zeros(d),
    }
    x = jnp.asarray(rs.randn(1, 16, d), jnp.float32)
    kw = dict(num_heads=2, precision="highest")

    # interpret-mode sdpa on CPU: exact vs exp2 agree to fp32 rounding but
    # must both run (exp2 multiplies the logit scale by log2 e — a wrong
    # plumbing would change results at the 1e-2 level, not 1e-6)
    import fast_speech_enhancement_metrics_tpu.ops.sdpa_pallas as sp

    orig = sp.sdpa
    sp.sdpa = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        a = _attention(p, x, impl="sdpa", softmax="exact", **kw)
        b = _attention(p, x, impl="sdpa", softmax="exp2", **kw)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        with pytest.raises(ValueError):
            _attention(p, x, impl="sdpa_bf16", **kw)  # typo'd impl
    finally:
        sp.sdpa = orig


def test_dnsmos_conv_pack_validates():
    from fast_speech_enhancement_metrics_tpu import DNSMOS

    with pytest.raises(ValueError):
        DNSMOS(conv_pack="MXU")


def test_attention_block_kernel_matches_einsum():
    """Round-5: the fused attention-block megakernel (QKV + softmax + AV +
    o-proj + residual + post-LN in one Pallas kernel) must reproduce the
    einsum path's block output to bf16-class accuracy, including the
    padded-T masking path."""
    import jax.numpy as jnp

    from fast_speech_enhancement_metrics_tpu.models.hubert import (
        _attention,
        _layer_norm,
    )
    from fast_speech_enhancement_metrics_tpu.ops.attn_block_pallas import (
        attn_block,
    )

    rs = np.random.RandomState(7)
    d, H, t = 64, 4, 43  # t deliberately not a sublane multiple
    p = {
        "q_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "k_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "v_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "o_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "q_b": jnp.asarray(rs.randn(d) * 0.1, jnp.float32),
        "k_b": jnp.asarray(rs.randn(d) * 0.1, jnp.float32),
        "v_b": jnp.asarray(rs.randn(d) * 0.1, jnp.float32),
        "o_b": jnp.asarray(rs.randn(d) * 0.1, jnp.float32),
        "ln1_s": jnp.ones(d), "ln1_b": jnp.zeros(d),
    }
    x = jnp.asarray(rs.randn(2, t, d) * 0.5, jnp.float32)
    ref = _layer_norm(
        x + _attention(p, x, H, "highest", "einsum", "exact"),
        p["ln1_s"], p["ln1_b"], 1e-5,
    )
    for softmax in ("exp2", "exact"):
        got = attn_block(p, x, H, 1e-5, softmax=softmax, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-2, rtol=0
        )
        # bf16-class, not garbage: the bulk must agree much tighter
        med = np.median(np.abs(np.asarray(got) - np.asarray(ref)))
        assert med < 3e-3


def test_ffn_block_kernel_matches_xla():
    """The fused FFN-block kernel must reproduce LN(x + FFN(x)) to
    bf16-class accuracy (both gelu variants, split hidden slabs)."""
    import jax.numpy as jnp

    from fast_speech_enhancement_metrics_tpu.models.hubert import (
        _layer_norm,
        _matmul,
    )
    from fast_speech_enhancement_metrics_tpu.ops.attn_block_pallas import (
        ffn_block,
    )
    import jax

    rs = np.random.RandomState(9)
    d, ffn, t = 64, 256, 43
    p = {
        "ff_w1": jnp.asarray(rs.randn(d, ffn) * 0.1, jnp.float32),
        "ff_b1": jnp.asarray(rs.randn(ffn) * 0.1, jnp.float32),
        "ff_w2": jnp.asarray(rs.randn(ffn, d) * 0.1, jnp.float32),
        "ff_b2": jnp.asarray(rs.randn(d) * 0.1, jnp.float32),
        "ln2_s": jnp.ones(d), "ln2_b": jnp.zeros(d),
    }
    x = jnp.asarray(rs.randn(2, t, d) * 0.5, jnp.float32)
    for gelu in ("tanh", "erf"):
        h = jax.nn.gelu(
            _matmul(x, p["ff_w1"], "highest") + p["ff_b1"],
            approximate=gelu == "tanh",
        )
        ref = _layer_norm(
            x + _matmul(h, p["ff_w2"], "highest") + p["ff_b2"],
            p["ln2_s"], p["ln2_b"], 1e-5,
        )
        got = ffn_block(p, x, 1e-5, gelu=gelu, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-2, rtol=0
        )
        assert np.median(np.abs(np.asarray(got) - np.asarray(ref))) < 3e-3


def test_attn_block_int8_screening_class():
    """int8 screening mode: stays a rough approximation of the block (its
    whole point is out-of-contract speed) but must not be garbage — bulk
    agreement within the int8 class."""
    import jax.numpy as jnp

    from fast_speech_enhancement_metrics_tpu.ops.attn_block_pallas import (
        attn_block,
    )

    rs = np.random.RandomState(11)
    d, H, t = 64, 4, 40
    p = {
        "q_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "k_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "v_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "o_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "q_b": jnp.zeros(d), "k_b": jnp.zeros(d), "v_b": jnp.zeros(d),
        "o_b": jnp.zeros(d),
        "ln1_s": jnp.ones(d), "ln1_b": jnp.zeros(d),
    }
    x = jnp.asarray(rs.randn(2, t, d), jnp.float32)
    ref = attn_block(p, x, H, 1e-5, softmax="exp2", interpret=True)
    got = attn_block(p, x, H, 1e-5, softmax="exp2", interpret=True, quant="int8")
    diff = np.abs(np.asarray(got) - np.asarray(ref))
    assert np.median(diff) < 0.05
    assert diff.max() < 0.5


def test_layer_block_matches_separate_blocks():
    """The merged whole-layer kernel must reproduce the attention-block +
    FFN-block composition bit-for-bit (same dtypes, same order)."""
    import jax.numpy as jnp

    from fast_speech_enhancement_metrics_tpu.ops.attn_block_pallas import (
        attn_block,
        ffn_block,
        layer_block,
    )

    rs = np.random.RandomState(13)
    d, H, ffn, t = 64, 4, 256, 43
    p = {
        "q_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "k_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "v_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "o_w": jnp.asarray(rs.randn(d, d) * 0.1, jnp.float32),
        "q_b": jnp.zeros(d), "k_b": jnp.zeros(d), "v_b": jnp.zeros(d),
        "o_b": jnp.zeros(d),
        "ln1_s": jnp.ones(d), "ln1_b": jnp.zeros(d),
        "ff_w1": jnp.asarray(rs.randn(d, ffn) * 0.1, jnp.float32),
        "ff_b1": jnp.zeros(ffn),
        "ff_w2": jnp.asarray(rs.randn(ffn, d) * 0.1, jnp.float32),
        "ff_b2": jnp.zeros(d),
        "ln2_s": jnp.ones(d), "ln2_b": jnp.zeros(d),
    }
    x = jnp.asarray(rs.randn(2, t, d) * 0.5, jnp.float32)
    sep = ffn_block(
        p, attn_block(p, x, H, 1e-5, softmax="exp2", interpret=True),
        1e-5, gelu="tanh", interpret=True,
    )
    merged = layer_block(p, x, H, 1e-5, softmax="exp2", gelu="tanh",
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(sep), np.asarray(merged))
