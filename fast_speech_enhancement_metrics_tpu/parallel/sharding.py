"""Sharding rules: batch data-parallelism + HuBERT tensor-parallelism.

GSPMD-style: we annotate parameter and activation shardings with
``NamedSharding``/``PartitionSpec`` and let XLA insert the collectives. The
HuBERT TP layout is the standard Megatron split (BASELINE.json's "encoder
sharded 2-way"):

* q/k/v projections: output (head) dim over ``model`` -> attention runs on
  local heads only,
* attention output projection: input dim over ``model`` (psum after),
* FFN: first matmul output dim, second matmul input dim over ``model``,
* everything tiny (layer norms, biases of reduced matmuls, conv feature
  extractor, DNSMOS) replicates.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast_speech_enhancement_metrics_tpu.models.hubert import HubertConfig


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Utterance batches shard over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _layer_specs() -> dict:
    """PartitionSpecs for one transformer layer (Megatron TP split)."""
    col = P(None, "model")  # output dim sharded
    row = P("model", None)  # input dim sharded
    return {
        "q_w": col, "q_b": P("model"),
        "k_w": col, "k_b": P("model"),
        "v_w": col, "v_b": P("model"),
        "o_w": row, "o_b": P(),
        "ln1_s": P(), "ln1_b": P(),
        "ff_w1": col, "ff_b1": P("model"),
        "ff_w2": row, "ff_b2": P(),
        "ln2_s": P(), "ln2_b": P(),
    }


def hubert_param_sharding(mesh: Mesh, config: HubertConfig, params) -> dict:
    """Pytree of ``NamedSharding`` matching a HuBERT param pytree.

    Conv front-end and norms replicate (tiny); transformer matmuls shard
    over ``model``. Works for any ``model`` axis size that divides the head
    count and FFN width (1 = fully replicated).
    """
    tp = mesh.shape["model"]
    if config.num_attention_heads % tp or config.intermediate_size % tp:
        raise ValueError(
            f"model axis {tp} must divide heads {config.num_attention_heads} "
            f"and FFN width {config.intermediate_size}"
        )

    def named(spec):
        return NamedSharding(mesh, spec)

    rep = jax.tree.map(lambda _: named(P()), params)
    layer_specs = {k: named(v) for k, v in _layer_specs().items()}
    rep["layers"] = [dict(layer_specs) for _ in params["layers"]]
    return rep


def shard_params(params, mesh: Mesh, config: HubertConfig):
    """Place a HuBERT param pytree onto the mesh with TP shardings."""
    shardings = hubert_param_sharding(mesh, config, params)
    return jax.tree.map(jax.device_put, params, shardings)
