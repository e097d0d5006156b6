"""Converter + (de)serialization for HuBERT weights.

``python -m fast_speech_enhancement_metrics_tpu.utils.convert_hubert
[model_name_or_path] [output.npz]`` pulls an HF ``HubertModel`` (default
``utter-project/mHuBERT-147``, the encoder SpeechBERTScore uses — reference:
fast_se_metrics/SpeechBERTScore.py:25), maps it to the JAX pytree layout
(models/hubert.py) and saves a flat ``.npz`` for fully-offline TPU serving.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.models.hubert import (
    HubertConfig,
    convert_hf_hubert,
)

MHUBERT_147 = "utter-project/mHuBERT-147"


def save_params(params, path: str) -> None:
    """Flatten the nested pytree to ``a.b.0.c``-keyed float32 npz."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")
        else:
            flat[prefix] = np.asarray(node, dtype=np.float32)

    walk(params, "")
    np.savez(path, **flat)


def load_params(path: str, dtype=jnp.float32):
    """Rebuild the nested pytree from a flat npz."""
    with np.load(path) as data:
        flat = dict(data)

    root: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value, dtype=dtype)

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def config_from_hf(hf_config) -> HubertConfig:
    return HubertConfig(
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        conv_bias=hf_config.conv_bias,
        feat_extract_norm=hf_config.feat_extract_norm,
        feat_proj_layer_norm=hf_config.feat_proj_layer_norm,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
        do_stable_layer_norm=hf_config.do_stable_layer_norm,
        layer_norm_eps=hf_config.layer_norm_eps,
    )


def convert_pretrained(name_or_path: str = MHUBERT_147):
    """Load an HF HubertModel (hub cache or local dir) -> (params, config)."""
    from transformers import AutoModel

    model = AutoModel.from_pretrained(name_or_path)
    config = config_from_hf(model.config)
    params = convert_hf_hubert(model.state_dict(), config)
    return params, config


def main(name: str = MHUBERT_147, out: str = "mhubert147.npz") -> None:
    params, config = convert_pretrained(name)
    save_params(params, out)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"wrote {out}: {n/1e6:.1f} M parameters, config={config}")


if __name__ == "__main__":
    main(*sys.argv[1:])
