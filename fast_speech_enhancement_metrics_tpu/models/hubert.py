"""HuBERT speech encoder as pure JAX functions, TPU-native.

Architecture contract: Hugging Face ``HubertModel`` (the reference loads
``utter-project/mHuBERT-147`` through ``AutoModel`` — reference:
fast_se_metrics/SpeechBERTScore.py:25): a 7-layer strided conv feature
encoder (group-norm variant), feature projection, a grouped positional conv
(batch-norm variant for mHuBERT-147, weight-norm otherwise), and a post-LN
transformer stack.

TPU design decisions:

* the conv feature extractor runs as 1-D ``lax.conv_general_dilated`` in NWC
  layout; the positional conv's weight-norm folds into the conv weights at
  conversion time, and its batch-norm reduces to a per-channel affine
  pre-transform (inference-only framework — no parametrization machinery),
* attention is one fused ``einsum`` chain over (B, H, T, D) with static
  shapes; SpeechBERTScore only needs ``hidden_states[output_layer]`` so the
  stack runs exactly ``output_layer`` encoder layers and stops (the reference
  runs all 12 and discards the last 4),
* matmul precision is configurable: ``"highest"`` for fp32 parity,
  ``"default"`` to let the MXU run bf16 passes for speed,
* params are a nested dict pytree — every leaf shardable via
  ``jax.sharding`` trees for tensor-parallel serving (see parallel/).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    """The subset of HF ``HubertConfig`` that affects inference."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" | "layer"
    feat_proj_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5


#: mHuBERT-147 is HuBERT-base with a batch-norm positional conv (folded away
#: at conversion, so the inference config is the default one)
MHUBERT_147_CONFIG = HubertConfig()


def _layer_norm(x, scale, bias, eps):
    # stats and normalization always in fp32 (bf16 mean/var over 768-3072
    # elements is too coarse); the cast pair fuses into the elementwise chain
    # and the materialized tensors keep x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return out.astype(x.dtype)


def _conv1d(x, w, stride=1, padding="VALID", groups=1, precision=None):
    """x: (B, T, C_in), w: (K, C_in/groups, C_out)."""
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
    )


#: time-packing factor for the first feature-encoder conv (1 = off).
#: Hypothesis: the (10, 1, 512) kernel's K = 10 contraction starves the
#: 128-deep MXU; packing p time outputs into the channel axis (kernel
#: 10 -> 5p+5, stride 5 -> 5p, C_out -> p*512) raises K at identical math
#: (dev 0 on CPU). MEASURED NEGATIVE at p = 24: 296 vs 285 ms/eval on the
#: full metric (tools/prof_sbs_r4.py) — XLA's conv emitter does not pay
#: the naive K/128 penalty, so the transform stays available but OFF.
FE_CONV0_PACK = 1


def _packed_conv0(x, w, stride: int, p: int, precision):
    """x: (B, T, 1), w: (K, 1, C) VALID/stride conv == packed
    (K + (p-1)*stride, 1, p*C) conv at stride p*stride + reshape."""
    k, _, c = w.shape
    t_out = (x.shape[1] - k) // stride + 1
    to_p = -(-t_out // p)
    wp = jnp.zeros((k + (p - 1) * stride, 1, p * c), w.dtype)
    for a in range(p):
        wp = wp.at[a * stride : a * stride + k, :, a * c : (a + 1) * c].set(w)
    need = (to_p - 1) * p * stride + wp.shape[0]
    if need > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1]), (0, 0)))
    y = lax.conv_general_dilated(
        x,
        wp.astype(x.dtype),
        window_strides=(p * stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    return y.reshape(x.shape[0], to_p * p, c)[:, :t_out]


def feature_encoder(params, audio, config: HubertConfig, precision=None, gelu="erf"):
    """(B, T) raw audio -> (B, frames, conv_dim[-1]) conv features."""
    x = audio[..., None]  # NWC with one channel
    for i, layer in enumerate(params["feature_encoder"]):
        if i == 0 and FE_CONV0_PACK > 1 and x.shape[1] >= 4 * FE_CONV0_PACK * config.conv_stride[0]:
            x = _packed_conv0(
                x, layer["w"], config.conv_stride[0], FE_CONV0_PACK, precision
            )
        else:
            x = _conv1d(x, layer["w"], stride=config.conv_stride[i], precision=precision)
        if "b" in layer:
            x = x + layer["b"]
        if config.feat_extract_norm == "group" and i == 0:
            # GroupNorm(groups == channels): per-channel norm over time.
            # Stats in fp32 via one-pass E[x^2]-E[x]^2 (fp32 accumulators
            # over the 51k-frame axis) — the layer-0 feature map is the
            # encoder's biggest tensor and a textbook two-pass mean/var
            # re-reads it from HBM
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
            var = jnp.maximum(var, 0.0)
            xf = (xf - mean) * lax.rsqrt(var + config.layer_norm_eps)
            x = (
                xf * layer["norm_scale"].astype(jnp.float32)
                + layer["norm_bias"].astype(jnp.float32)
            ).astype(x.dtype)
        elif config.feat_extract_norm == "layer":
            x = _layer_norm(x, layer["norm_scale"], layer["norm_bias"], config.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=gelu == "tanh")
    return x


def _matmul(x, w, precision):
    return jnp.matmul(x, w, precision=precision)


def _flash_sdpa(q, k, v, scaling):
    """Pallas TPU flash attention: never materializes the (B, H, T, T) logits
    in HBM (XLA's attention writes+reads ~T^2*H*4 bytes per layer — the HBM
    bottleneck at ~800 frames). Sequences pad to the kernel block size with
    segment-id masking so padded keys are invisible to real queries."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, _, t, _ = q.shape
    pad = (-t) % 512
    if pad:
        spatial = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(a, spatial) for a in (q, k, v))
    ids = jnp.broadcast_to(
        (jnp.arange(t + pad) >= t).astype(jnp.int32), (b, t + pad)
    )
    out = flash_attention(
        q, k, v, segment_ids=SegmentIds(ids, ids), sm_scale=scaling
    )
    return out[:, :, :t, :] if pad else out


def _attention(
    p, x, num_heads, precision, impl="einsum", softmax="exact", fused_qkv=True
):
    b, t, d = x.shape
    head_dim = d // num_heads
    scaling = head_dim**-0.5

    def split(h):
        return h.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)

    if fused_qkv:
        # one fused (d, 3d) projection instead of three: a third of the
        # activation reads and one full-width MXU pass (the weight concat is
        # a few MB, re-formed per call — negligible next to the (B*T, d)
        # operand). Disabled under tensor parallelism: q_w/k_w/v_w are
        # column-sharded over the 'model' axis, and concatenating along the
        # sharded dim + slicing back across shard boundaries would force
        # GSPMD to reshard the projections every layer.
        qkv_w = jnp.concatenate([p["q_w"], p["k_w"], p["v_w"]], axis=1)
        qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]])
        qkv = _matmul(x, qkv_w, precision) + qkv_b
        q = split(qkv[..., :d])
        k = split(qkv[..., d : 2 * d])
        v = split(qkv[..., 2 * d :])
    else:
        q = split(_matmul(x, p["q_w"], precision) + p["q_b"])
        k = split(_matmul(x, p["k_w"], precision) + p["k_b"])
        v = split(_matmul(x, p["v_w"], precision) + p["v_b"])

    if impl not in ("einsum", "flash", "sdpa", "sdpa_exp2", "sdpa_exp2_bf16"):
        raise ValueError(f"unknown attention impl: {impl!r}")
    if impl in ("flash", "sdpa", "sdpa_exp2", "sdpa_exp2_bf16"):
        kernel = _flash_sdpa
        if impl == "flash" and softmax == "exp2":
            # the flash kernel always runs the exact (max-shifted) softmax;
            # coerce rather than raise so "auto" impl selection can cross the
            # flash threshold under the exp2 default (same scores class)
            softmax = "exact"
        if impl.startswith("sdpa"):
            import functools

            from fast_speech_enhancement_metrics_tpu.ops.sdpa_pallas import sdpa

            # "sdpa" inherits the caller's softmax mode ("exact"/"exp2");
            # "sdpa_exp2"/"sdpa_exp2_bf16" force a kernel mode explicitly
            # (characterized in tools/prof_sbs_softmax.py)
            kernel_softmax = {
                "sdpa": softmax if softmax in ("exact", "exp2") else "exact",
                "sdpa_exp2": "exp2",
                "sdpa_exp2_bf16": "exp2_bf16",
            }.get(impl)
            if kernel_softmax is None:
                raise ValueError(f"unknown attention impl: {impl!r}")
            kernel = functools.partial(sdpa, softmax=kernel_softmax)
        if precision in (None, "default"):
            # Mosaic lowers fp32 matmuls to multi-pass; at default precision
            # feed the kernel bf16 operands (same fidelity class as the bf16
            # MXU einsum path) and take the fp32 softmax-accumulated output
            out_dtype = q.dtype
            q, k, v = (a.astype(jnp.bfloat16) for a in (q, k, v))
            ctx = kernel(q, k, v, scaling).astype(out_dtype)
        else:
            ctx = kernel(q, k, v, scaling)
    elif softmax == "exp2":
        # max-free softmax: fold log2(e) into the logit scale and normalize
        # unshifted 2^x — exact in infinite precision (softmax shift
        # invariance), overflow-guarded by the clamp (fp32 2^x holds to
        # x ~ 127; encoder logits measure |x·log2e| ~ 9). Drops the max
        # reduce + subtract passes over the (B, H, T, T) tensor.
        s2 = scaling * 1.4426950408889634
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * s2, k, precision=precision)
        pw = jnp.exp2(jnp.clip(logits.astype(jnp.float32), -100.0, 120.0))
        weights = (pw / jnp.sum(pw, axis=-1, keepdims=True)).astype(logits.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v, precision=precision)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scaling, k, precision=precision)
        # softmax in fp32 regardless of the activation dtype; with bf16
        # activations the (B, H, T, T) logits/weights tensors stay bf16 in
        # HBM (the layer's bandwidth bottleneck) while exp/normalize run
        # fp32 in-register
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            logits.dtype
        )
        ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v, precision=precision)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
    return _matmul(ctx, p["o_w"], precision) + p["o_b"]


def _encoder_layer(
    p, x, config: HubertConfig, precision, attention_impl="einsum", gelu="erf",
    softmax="exact", fused_qkv=True,
):
    eps = config.layer_norm_eps
    approx = gelu == "tanh"
    if config.do_stable_layer_norm:
        x = x + _attention(
            p,
            _layer_norm(x, p["ln1_s"], p["ln1_b"], eps),
            config.num_attention_heads,
            precision,
            attention_impl,
            softmax,
            fused_qkv,
        )
        h = _layer_norm(x, p["ln2_s"], p["ln2_b"], eps)
        h = jax.nn.gelu(_matmul(h, p["ff_w1"], precision) + p["ff_b1"], approximate=approx)
        return x + (_matmul(h, p["ff_w2"], precision) + p["ff_b2"])
    # post-LN (HuBERT-base / mHuBERT-147)
    if attention_impl == "layer_block" and gelu == "tanh":
        # whole layer (attention + FFN blocks) in ONE Pallas kernel
        from fast_speech_enhancement_metrics_tpu.ops.attn_block_pallas import (
            layer_block,
        )

        return layer_block(
            p, x, config.num_attention_heads, eps,
            softmax="exp2" if softmax == "exp2" else "exact",
            gelu=gelu, interpret=jax.default_backend() != "tpu",
        )
    if attention_impl == "layer_block":
        attention_impl = "block_ffn"  # erf GELU: separate kernels + XLA FFN
    if attention_impl in ("block", "block_ffn", "block_int8"):
        # whole attention block (QKV -> softmax -> AV -> o-proj -> residual
        # -> LN) as ONE Pallas kernel: HBM sees x once in / once out instead
        # of the qkv / (H,T,T) probability / context round-trips
        # (ops/attn_block_pallas.py). Default-precision class only.
        # "block_ffn" additionally fuses the FFN block the same way.
        from fast_speech_enhancement_metrics_tpu.ops.attn_block_pallas import (
            attn_block,
            ffn_block,
        )

        interp = jax.default_backend() != "tpu"
        x = attn_block(
            p, x, config.num_attention_heads, eps,
            softmax=softmax if softmax in ("exp2", "exp2_bf16") else "exact",
            interpret=interp,
            quant="int8" if attention_impl == "block_int8" else None,
        )
        # Mosaic has no erf lowering — the FFN kernel is tanh-GELU only
        # (the default-precision path always uses tanh); erf callers get
        # the XLA FFN below after the fused attention block
        if attention_impl == "block_ffn" and (gelu == "tanh" or interp):
            return ffn_block(p, x, eps, gelu=gelu, interpret=interp)
    else:
        x = _layer_norm(
            x
            + _attention(
                p, x, config.num_attention_heads, precision, attention_impl,
                softmax, fused_qkv,
            ),
            p["ln1_s"],
            p["ln1_b"],
            eps,
        )
    h = jax.nn.gelu(_matmul(x, p["ff_w1"], precision) + p["ff_b1"], approximate=approx)
    return _layer_norm(
        x + (_matmul(h, p["ff_w2"], precision) + p["ff_b2"]), p["ln2_s"], p["ln2_b"], eps
    )


def hubert_hidden_state(
    params,
    audio: jnp.ndarray,
    config: HubertConfig = MHUBERT_147_CONFIG,
    output_layer: int = 8,
    precision: str | None = "highest",
    attention_impl: str = "einsum",
    act_dtype=None,
    gelu: str = "erf",
    softmax: str = "exact",
    fused_qkv: bool = True,
) -> jnp.ndarray:
    """(B, T) audio -> (B, frames, hidden) == HF ``hidden_states[output_layer]``.

    ``hidden_states[L]`` is the input to encoder layer L, i.e. the output of
    the first L encoder layers — only those L layers are executed.
    ``attention_impl="flash"`` selects the Pallas TPU flash-attention kernel.

    ``act_dtype=jnp.bfloat16`` runs the whole activation stream (conv feature
    maps, attention logits, MLP hiddens) in bf16 — the TPU analogue of the
    fp16 autocast the reference wraps this model in (reference:
    fast_se_metrics/SpeechBERTScore.py:8,46-51): it halves the encoder's HBM
    traffic, which is the bottleneck (the early conv feature maps and the
    (B, H, T, T) attention tensors dominate). Layer/group-norm statistics and
    softmax run fp32 in-register; the returned hidden states are fp32.

    ``gelu="tanh"`` swaps HF's exact erf GELU for the tanh approximation —
    an fp16-autocast-class numeric change (characterized on the encoder:
    see metrics/speechbertscore.py) that removes ~15% of the encoder's
    VPU time (erf measured 8.4 ms/layer slower than tanh on v5e,
    tools/prof_sbs_stages.py).
    """
    if act_dtype is not None:
        params = jax.tree.map(lambda a: a.astype(act_dtype), params)
        audio = audio.astype(act_dtype)
    x = feature_encoder(params, audio, config, precision, gelu=gelu)

    fp = params["feature_projection"]
    if config.feat_proj_layer_norm:
        x = _layer_norm(x, fp["ln_s"], fp["ln_b"], config.layer_norm_eps)
    x = jnp.einsum("btc,cd->btd", x, fp["w"], precision=precision) + fp["b"]

    pos_in = x
    if "bn_scale" in params["pos_conv"]:
        pos_in = x * params["pos_conv"]["bn_scale"] + params["pos_conv"]["bn_shift"]
    pos = _conv1d(
        pos_in,
        params["pos_conv"]["w"],
        padding=[(config.num_conv_pos_embeddings // 2,) * 2],
        groups=config.num_conv_pos_embedding_groups,
        precision=precision,
    )
    if config.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1, :]
    pos = jax.nn.gelu(pos + params["pos_conv"]["b"], approximate=False)
    x = x + pos

    enc = params["encoder_ln"]
    if not config.do_stable_layer_norm:
        # post-LN stack: encoder LayerNorm applies before the layers
        x = _layer_norm(x, enc["s"], enc["b"], config.layer_norm_eps)

    for p in params["layers"][:output_layer]:
        x = _encoder_layer(
            p, x, config, precision, attention_impl, gelu=gelu, softmax=softmax,
            fused_qkv=fused_qkv,
        )

    if config.do_stable_layer_norm and output_layer == config.num_hidden_layers:
        # pre-LN stack: encoder LayerNorm applies after the FINAL layer, and
        # HF's hidden_states[num_layers] includes it
        x = _layer_norm(x, enc["s"], enc["b"], config.layer_norm_eps)
    return x.astype(jnp.float32) if act_dtype is not None else x


def init_params(
    rng: jax.Array, config: HubertConfig = MHUBERT_147_CONFIG, dtype=jnp.float32
):
    """Random-initialized parameter pytree (for dry-runs / sharding tests /
    architecture benchmarks where real weights aren't needed)."""
    counter = [0]

    def nxt(*shape, scale=0.02):
        counter[0] += 1
        key = jax.random.fold_in(rng, counter[0])
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    def zeros(*shape):
        return jnp.zeros(shape, dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    d = config.hidden_size
    params: dict = {"feature_encoder": []}
    for i, out_c in enumerate(config.conv_dim):
        in_c = 1 if i == 0 else config.conv_dim[i - 1]
        layer = {"w": nxt(config.conv_kernel[i], in_c, out_c, scale=0.1)}
        if config.conv_bias:
            layer["b"] = zeros(out_c)
        if (config.feat_extract_norm == "group" and i == 0) or (
            config.feat_extract_norm == "layer"
        ):
            layer["norm_scale"] = ones(out_c)
            layer["norm_bias"] = zeros(out_c)
        params["feature_encoder"].append(layer)

    params["feature_projection"] = {
        "w": nxt(config.conv_dim[-1], d),
        "b": zeros(d),
    }
    if config.feat_proj_layer_norm:
        params["feature_projection"]["ln_s"] = ones(config.conv_dim[-1])
        params["feature_projection"]["ln_b"] = zeros(config.conv_dim[-1])

    groups = config.num_conv_pos_embedding_groups
    params["pos_conv"] = {
        "w": nxt(config.num_conv_pos_embeddings, d // groups, d),
        "b": zeros(d),
    }
    params["encoder_ln"] = {"s": ones(d), "b": zeros(d)}

    params["layers"] = [
        {
            "q_w": nxt(d, d), "q_b": zeros(d),
            "k_w": nxt(d, d), "k_b": zeros(d),
            "v_w": nxt(d, d), "v_b": zeros(d),
            "o_w": nxt(d, d), "o_b": zeros(d),
            "ln1_s": ones(d), "ln1_b": zeros(d),
            "ff_w1": nxt(d, config.intermediate_size),
            "ff_b1": zeros(config.intermediate_size),
            "ff_w2": nxt(config.intermediate_size, d),
            "ff_b2": zeros(d),
            "ln2_s": ones(d), "ln2_b": zeros(d),
        }
        for _ in range(config.num_hidden_layers)
    ]
    return params


# -- HF checkpoint conversion -------------------------------------------------


def convert_hf_hubert(state_dict, config: HubertConfig = MHUBERT_147_CONFIG):
    """Map an HF ``HubertModel`` state dict to the JAX parameter pytree.

    Handles all three positional-conv parametrizations (plain, weight-norm
    old/new naming, batch-norm) by folding them into a single conv weight —
    float64 host math, inference-only.
    """

    def g(key):
        return np.asarray(state_dict[key].detach().cpu().numpy(), dtype=np.float64)

    params: dict = {"feature_encoder": []}
    for i in range(len(config.conv_dim)):
        prefix = f"feature_extractor.conv_layers.{i}"
        layer = {"w": g(f"{prefix}.conv.weight").transpose(2, 1, 0)}  # OIK -> KIO
        if config.conv_bias:
            layer["b"] = g(f"{prefix}.conv.bias")
        if f"{prefix}.layer_norm.weight" in state_dict:
            layer["norm_scale"] = g(f"{prefix}.layer_norm.weight")
            layer["norm_bias"] = g(f"{prefix}.layer_norm.bias")
        params["feature_encoder"].append(layer)

    params["feature_projection"] = {
        "w": g("feature_projection.projection.weight").T,
        "b": g("feature_projection.projection.bias"),
    }
    if config.feat_proj_layer_norm:
        params["feature_projection"]["ln_s"] = g("feature_projection.layer_norm.weight")
        params["feature_projection"]["ln_b"] = g("feature_projection.layer_norm.bias")

    # positional conv: fold parametrizations into one (K, C/groups, C) weight
    pc = "encoder.pos_conv_embed"
    if f"{pc}.conv.weight_g" in state_dict or f"{pc}.conv.parametrizations.weight.original0" in state_dict:
        if f"{pc}.conv.weight_g" in state_dict:
            g_w, v_w = g(f"{pc}.conv.weight_g"), g(f"{pc}.conv.weight_v")
        else:
            g_w = g(f"{pc}.conv.parametrizations.weight.original0")
            v_w = g(f"{pc}.conv.parametrizations.weight.original1")
        # torch weight_norm dim=2 on (O, I/g, K): per-k norm over (O, I/g)
        norm = np.sqrt((v_w**2).sum(axis=(0, 1), keepdims=True))
        weight = g_w * v_w / norm
    else:
        weight = g(f"{pc}.conv.weight")
    pos_w = weight.transpose(2, 1, 0)  # (O, I/g, K) -> (K, I/g, O)
    pos_b = g(f"{pc}.conv.bias")
    params["pos_conv"] = {"w": pos_w, "b": pos_b}
    if f"{pc}.batch_norm.running_mean" in state_dict:
        # eval-mode BN on the conv *input* reduces to a per-channel affine
        # x' = x*s + t. It cannot fold into the conv weights because the conv
        # zero-pads the BN *output* at the sequence boundary, so keep it as
        # an (elementwise, negligible) pre-transform at runtime.
        mean = g(f"{pc}.batch_norm.running_mean")
        var = g(f"{pc}.batch_norm.running_var")
        gamma = g(f"{pc}.batch_norm.weight")
        beta = g(f"{pc}.batch_norm.bias")
        s = gamma / np.sqrt(var + 1e-5)
        params["pos_conv"]["bn_scale"] = s
        params["pos_conv"]["bn_shift"] = beta - mean * s

    params["encoder_ln"] = {
        "s": g("encoder.layer_norm.weight"),
        "b": g("encoder.layer_norm.bias"),
    }

    params["layers"] = []
    for i in range(config.num_hidden_layers):
        prefix = f"encoder.layers.{i}"
        params["layers"].append(
            {
                "q_w": g(f"{prefix}.attention.q_proj.weight").T,
                "q_b": g(f"{prefix}.attention.q_proj.bias"),
                "k_w": g(f"{prefix}.attention.k_proj.weight").T,
                "k_b": g(f"{prefix}.attention.k_proj.bias"),
                "v_w": g(f"{prefix}.attention.v_proj.weight").T,
                "v_b": g(f"{prefix}.attention.v_proj.bias"),
                "o_w": g(f"{prefix}.attention.out_proj.weight").T,
                "o_b": g(f"{prefix}.attention.out_proj.bias"),
                "ln1_s": g(f"{prefix}.layer_norm.weight"),
                "ln1_b": g(f"{prefix}.layer_norm.bias"),
                "ff_w1": g(f"{prefix}.feed_forward.intermediate_dense.weight").T,
                "ff_b1": g(f"{prefix}.feed_forward.intermediate_dense.bias"),
                "ff_w2": g(f"{prefix}.feed_forward.output_dense.weight").T,
                "ff_b2": g(f"{prefix}.feed_forward.output_dense.bias"),
                "ln2_s": g(f"{prefix}.final_layer_norm.weight"),
                "ln2_b": g(f"{prefix}.final_layer_norm.bias"),
            }
        )

    return jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), params)
