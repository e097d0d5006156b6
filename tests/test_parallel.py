"""Multi-chip consistency: sharded results must equal single-device results.

The TPU analogue of the reference's CPU<->GPU consistency family
(reference: tests/test_cuda.py:8-23): every metric computed on an 8-device
``('data', 'model')`` mesh must match the single-device result, proving the
sharding annotations change the schedule, not the math.
"""

import jax
import numpy as np
import pytest

from fast_speech_enhancement_metrics_tpu import DNSMOS, LSD, PESQ, SDR, STOI
from fast_speech_enhancement_metrics_tpu.parallel import create_mesh


def _compare(metric_cls, speech_data, mesh, *, abs_tol=5e-5, **kw):
    single = metric_cls(**kw)(speech_data["speech"], speech_data["noisy_speech"])
    sharded = metric_cls(mesh=mesh, **kw)(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    for a, b in zip(single, sharded):
        for key in a:
            assert a[key] == pytest.approx(b[key], abs=abs_tol), key


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(data=4, model=2, devices=jax.devices()[:8])


@pytest.mark.parametrize("metric_cls", [LSD, SDR, PESQ])
def test_data_parallel_consistency(metric_cls, speech_data, mesh):
    # SDR is dB-scale (values ~±20) and runs a long fp32 Levinson recursion,
    # so sharded-vs-single fusion/tile differences show up at ~1e-4 dB; the
    # unitless 0-5-scale metrics keep the tight bound.
    tol = 1e-3 if metric_cls is SDR else 5e-5
    _compare(metric_cls, speech_data, mesh, abs_tol=tol)


def test_stoi_data_parallel_consistency(speech_data, mesh):
    _compare(STOI, speech_data, mesh, sample_rate=16000)


def test_dnsmos_replicated_consistency(speech_data, mesh):
    single = DNSMOS()(None, speech_data["noisy_speech"])
    sharded = DNSMOS(mesh=mesh)(None, speech_data["noisy_speech"])
    for a, b in zip(single, sharded):
        for key in a:
            assert a[key] == pytest.approx(b[key], abs=5e-5), key


def test_hubert_tensor_parallel_consistency(speech_data, mesh):
    """2-way Megatron TP of the encoder must not change the embeddings."""
    import torch

    from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
    from fast_speech_enhancement_metrics_tpu.models.hubert import convert_hf_hubert
    from fast_speech_enhancement_metrics_tpu.utils.convert_hubert import config_from_hf
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel

    torch.manual_seed(0)
    cfg = HFConfig(
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
    model = HubertModel(cfg).eval()
    params = convert_hf_hubert(model.state_dict(), config_from_hf(cfg))

    kw = dict(config=config_from_hf(cfg), output_layer=3)
    single = SpeechBERTScore(params=params, **kw)(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    sharded = SpeechBERTScore(params=params, mesh=mesh, **kw)(
        speech_data["speech"], speech_data["noisy_speech"]
    )
    for a, b in zip(single, sharded):
        assert a["SpeechBERTScore"] == pytest.approx(
            b["SpeechBERTScore"], abs=1e-5
        )
