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


@pytest.mark.parametrize("batch", [1, 3])
def test_data_parallel_indivisible_batch(speech_data, mesh, batch):
    """Batches that don't divide the data axis shard via pad-and-mask
    (base.py::prepare_audio pads with replicas of the last row; ``compute``
    drops the pad scores host-side) — any batch size on any mesh."""
    c = speech_data["speech"][:batch]
    d = speech_data["noisy_speech"][:batch]
    single = LSD()(c, d)
    sharded = LSD(mesh=mesh)(c, d)
    assert len(sharded) == batch
    for a, b in zip(single, sharded):
        assert a["LSD"] == pytest.approx(b["LSD"], abs=5e-5)


def test_ragged_batch_on_mesh(speech_data, mesh):
    """Ragged inputs route through exact-length groups of arbitrary size;
    each group must shard regardless of the data-axis divisibility."""
    c = [np.asarray(r) for r in speech_data["speech"]]
    d = [np.asarray(r) for r in speech_data["noisy_speech"]]
    # lengths: 3 utterances at T-160, 1 at full T -> groups of size 3 and 1
    c = [r[:-160] for r in c[:3]] + [c[3]]
    d = [r[:-160] for r in d[:3]] + [d[3]]
    single = LSD()(c, d)
    sharded = LSD(mesh=mesh)(c, d)
    assert len(sharded) == 4
    for a, b in zip(single, sharded):
        assert a["LSD"] == pytest.approx(b["LSD"], abs=5e-5)


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
