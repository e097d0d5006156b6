"""Fused post-LN attention block as a single Pallas TPU kernel.

One encoder layer's whole attention block — QKV projections, per-head
exp2 (max-free) softmax attention, output projection, residual add and the
post-attention LayerNorm — executes per batch row entirely in VMEM:

    y = LN(x + W_o · attn(x · W_qkv) + b_o)

The XLA einsum path (models/hubert.py::_attention) round-trips the
(T, 3d) qkv tensor, the (H, T, T) probability tensor and the (T, d)
context through HBM every layer (~3.5 GB/layer at the bench shape of
batch 64 x 799 frames); round-4 profiling concluded the encoder is bound
by that bf16 activation stream, not by MXU arithmetic
(results/PROFILING.md). This kernel keeps the whole block's intermediates
in VMEM: HBM sees x once in and y once out (bf16).

Numerics match the einsum path's default-precision class: bf16 MXU
operands, fp32 softmax normalization in-register, exp2 max-free softmax
with the ±60 overflow clamp (see ops/sdpa_pallas.py), LayerNorm statistics
in fp32. Reference behavior anchor: fast_se_metrics/SpeechBERTScore.py:46-51
(the torch encoder under fp16 autocast).

Head-pair structure: heads are processed two at a time so the per-pair QKV
weight slice starts at a 384-lane (3x128, register-aligned) boundary; the
(T, T) fp32 logits of only one head are ever live.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _quant_rows(x):
    """Dynamic per-row symmetric int8 quantization: (xq int8, scale (T,1))."""
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return jnp.round(x / s).astype(jnp.int8), s


def _quant_cols(x):
    """Per-column int8 quantization (for right-hand matmul operands whose
    contraction runs over rows): (xq int8, scale (1, N))."""
    s = jnp.max(jnp.abs(x), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return jnp.round(x / s).astype(jnp.int8), s


def _dot_i8(xq, wq, sx, sw):
    """int8 x int8 -> int32 MXU dot, dequantized to fp32 (sx per row, sw
    per output column). The MXU runs int8 at 2x its bf16 rate on v5e."""
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * sx * sw


def _attn_block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, lns_ref, lnb_ref, out_ref,
    *, num_heads: int, t_real: int, eps: float, softmax: str,
    quant: str | None = None,
):
    t, d = x_ref.shape[1], x_ref.shape[2]
    head_dim = d // num_heads
    x = x_ref[0]  # (T, d) bf16
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    int8 = quant == "int8"
    if int8:
        # weights arrive pre-quantized per column (int8 values + fp32
        # scales in the last row of the bias operands — see wrapper)
        xq, sx = _quant_rows(x.astype(jnp.float32))

    ctx_parts = []
    for pair in range(num_heads // 2):
        lo = pair * 3 * head_dim * 2
        span = 3 * head_dim * 2
        # one (T, 384) projection per head pair; the weight slice is
        # 384-lane aligned by construction (see pack_attn_block_params)
        if int8:
            qkv = _dot_i8(
                xq, wqkv_ref[:, lo : lo + span], sx,
                bqkv_ref[1:2, lo : lo + span],
            ) + bqkv_ref[0, lo : lo + span]
        else:
            qkv = jax.lax.dot_general(
                x, wqkv_ref[:, lo : lo + span],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bqkv_ref[0, lo : lo + span]
        qkv = qkv.astype(jnp.float32 if int8 else jnp.bfloat16)
        for sub in range(2):
            o = sub * 3 * head_dim
            q = qkv[:, o : o + head_dim]
            k = qkv[:, o + head_dim : o + 2 * head_dim]
            v = qkv[:, o + 2 * head_dim : o + 3 * head_dim]
            if int8:
                qq, sq = _quant_rows(q)
                kq, sk = _quant_rows(k)
                s = (
                    jax.lax.dot_general(
                        qq, kq, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    * sq
                    * sk[:, 0][None, :]
                )
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (T, T) fp32, never leaves VMEM
            if t_real < t:
                s = jnp.where(col < t_real, s, -jnp.inf)
            if softmax == "exp2":
                # q pre-scaled by scaling*log2(e); ±60 clamp bounds the
                # row sum far from fp32 inf (see ops/sdpa_pallas.py)
                p = jnp.exp2(jnp.clip(s, -100.0, 60.0))
            elif softmax == "exp2_bf16":
                # packed-bf16 exponential: halves the VPU element stream of
                # the (T, T) softmax (the block kernel's largest VPU pass)
                p = jnp.exp2(jnp.clip(s, -100.0, 60.0).astype(jnp.bfloat16))
            else:
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            if int8:
                # normalize first, then fixed x127 probability quant; v
                # quantizes per COLUMN (the contraction runs over keys, so
                # per-key scales would not factor out of the sum)
                pn = p / l
                pq = jnp.round(pn * 127.0).astype(jnp.int8)
                vq, sv = _quant_cols(v)
                ctx = (
                    jax.lax.dot_general(
                        pq, vq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    / 127.0
                    * sv
                )
                ctx_parts.append(ctx)
            else:
                ctx = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ctx_parts.append((ctx / l).astype(jnp.bfloat16))

    ctx_all = jnp.concatenate(ctx_parts, axis=1)  # (T, d)
    if int8:
        cq, sc = _quant_rows(ctx_all)
        out = _dot_i8(cq, wo_ref[:], sc, bo_ref[1:2]) + bo_ref[0]
    else:
        out = jax.lax.dot_general(
            ctx_all, wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[0]
    r = out + x.astype(jnp.float32)
    mean = jnp.mean(r, axis=1, keepdims=True)
    cen = r - mean
    var = jnp.mean(cen * cen, axis=1, keepdims=True)
    y = cen * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    out_ref[0] = y.astype(out_ref.dtype)


def pack_attn_block_params(p, num_heads: int, softmax: str, quant=None):
    """Layer param dict -> packed operands for the fused block kernel.

    QKV weights interleave per head pair — [q_h0|k_h0|v_h0|q_h1|k_h1|v_h1|
    q_h2|...] — so each pair's slice starts at a 384-lane boundary. The
    attention scale (and log2(e) for the exp2 softmax) folds into the
    q columns and biases at trace time.
    """
    d = p["q_w"].shape[0]
    head_dim = d // num_heads
    scaling = head_dim**-0.5
    if softmax in ("exp2", "exp2_bf16"):
        scaling = scaling * LOG2E
    ws, bs = [], []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        ws += [p["q_w"][:, sl] * scaling, p["k_w"][:, sl], p["v_w"][:, sl]]
        bs += [p["q_b"][sl] * scaling, p["k_b"][sl], p["v_b"][sl]]
    wqkv = jnp.concatenate([w.astype(jnp.float32) for w in ws], axis=1)
    bqkv = jnp.concatenate(bs).astype(jnp.float32).reshape(1, -1)
    wo = p["o_w"].astype(jnp.float32)
    bo = p["o_b"].astype(jnp.float32).reshape(1, -1)
    if quant == "int8":
        # per-column weight quantization; the fp32 column scales ride as a
        # second row of the bias operands
        wqkv, sq = _quant_cols(wqkv)
        bqkv = jnp.concatenate([bqkv, sq], axis=0)
        wo, so = _quant_cols(wo)
        bo = jnp.concatenate([bo, so], axis=0)
    else:
        wqkv = wqkv.astype(jnp.bfloat16)
        wo = wo.astype(jnp.bfloat16)
    return (
        wqkv,
        bqkv,
        wo,
        bo,
        p["ln1_s"].astype(jnp.float32).reshape(1, -1),
        p["ln1_b"].astype(jnp.float32).reshape(1, -1),
    )


def _ffn_block_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref, out_ref,
    *, eps: float, gelu: str, splits: int,
):
    """y = LN(x + W2 · gelu(W1 · x + b1) + b2), post-LN FFN block.

    The hidden activation computes in ``splits`` column slabs so only one
    (T, ffn/splits) fp32 slab is ever live; each slab's contribution to the
    output accumulates through the second matmul immediately.
    """
    # the merged layer kernel feeds this an out_ref in the caller's dtype;
    # the matmul operand is bf16 either way (default-precision class)
    x = x_ref[0].astype(jnp.bfloat16)  # (T, d)
    d = x.shape[1]
    ffn = w1_ref.shape[1]
    cols = ffn // splits
    acc = None
    for s in range(splits):
        h = jax.lax.dot_general(
            x, w1_ref[:, s * cols : (s + 1) * cols],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b1_ref[0, s * cols : (s + 1) * cols]
        h = jax.nn.gelu(h, approximate=gelu == "tanh").astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            h, w2_ref[s * cols : (s + 1) * cols, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    r = acc + b2_ref[0] + x.astype(jnp.float32)
    mean = jnp.mean(r, axis=1, keepdims=True)
    cen = r - mean
    var = jnp.mean(cen * cen, axis=1, keepdims=True)
    y = cen * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    out_ref[0] = y.astype(out_ref.dtype)


def ffn_block(
    p,
    x: jnp.ndarray,
    eps: float,
    gelu: str = "tanh",
    interpret: bool = False,
) -> jnp.ndarray:
    """y = LN(x + FFN(x)) over (B, T, d), post-LN layers only — the FFN
    companion of ``attn_block``: the (T, ffn) hidden tensor never reaches
    HBM. Default-precision (bf16-operand) class."""
    b, t, d = x.shape
    ffn = p["ff_w1"].shape[1]
    pad = (-t) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    xb = x.astype(jnp.bfloat16)
    w1 = p["ff_w1"].astype(jnp.bfloat16)
    b1 = p["ff_b1"].astype(jnp.float32).reshape(1, -1)
    w2 = p["ff_w2"].astype(jnp.bfloat16)
    b2 = p["ff_b2"].astype(jnp.float32).reshape(1, -1)
    lns = p["ln2_s"].astype(jnp.float32).reshape(1, -1)
    lnb = p["ln2_b"].astype(jnp.float32).reshape(1, -1)

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _ffn_block_kernel, eps=eps, gelu=gelu,
            splits=2 if ffn % 256 == 0 else 1,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t + pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            rep(w1.shape),
            rep(b1.shape),
            rep(w2.shape),
            rep(b2.shape),
            rep(lns.shape),
            rep(lnb.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, t + pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t + pad, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xb, w1, b1, w2, b2, lns, lnb)
    return out[:, :t] if pad else out


def _layer_block_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, out_ref,
    *, num_heads: int, t_real: int, eps: float, softmax: str, gelu: str,
    splits: int,
):
    """Whole post-LN encoder layer (attention block + FFN block) in ONE
    kernel: x crosses the attention/FFN boundary inside VMEM."""
    # attention block writes its result into out_ref, then the FFN block
    # consumes it from VMEM (out_ref doubles as the intermediate)
    _attn_block_kernel(
        x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, lns_ref, lnb_ref, out_ref,
        num_heads=num_heads, t_real=t_real, eps=eps, softmax=softmax,
    )
    _ffn_block_kernel(
        out_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, out_ref,
        eps=eps, gelu=gelu, splits=splits,
    )


def layer_block(
    p,
    x: jnp.ndarray,
    num_heads: int,
    eps: float,
    softmax: str = "exp2",
    gelu: str = "tanh",
    interpret: bool = False,
) -> jnp.ndarray:
    """One whole post-LN encoder layer per Pallas invocation — the merged
    form of ``attn_block`` + ``ffn_block`` (one fewer x round-trip and half
    the grid steps per layer). Default-precision class; tanh GELU only."""
    b, t, d = x.shape
    assert num_heads % 2 == 0 and d % num_heads == 0
    ffn = p["ff_w1"].shape[1]
    pad = (-t) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    wqkv, bqkv, wo, bo, lns, lnb = pack_attn_block_params(p, num_heads, softmax)
    xb = x.astype(jnp.bfloat16)
    w1 = p["ff_w1"].astype(jnp.bfloat16)
    b1 = p["ff_b1"].astype(jnp.float32).reshape(1, -1)
    w2 = p["ff_w2"].astype(jnp.bfloat16)
    b2 = p["ff_b2"].astype(jnp.float32).reshape(1, -1)
    ln2s = p["ln2_s"].astype(jnp.float32).reshape(1, -1)
    ln2b = p["ln2_b"].astype(jnp.float32).reshape(1, -1)

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _layer_block_kernel,
            num_heads=num_heads, t_real=t, eps=eps, softmax=softmax,
            gelu=gelu, splits=2 if ffn % 256 == 0 else 1,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t + pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            rep(wqkv.shape), rep(bqkv.shape), rep(wo.shape), rep(bo.shape),
            rep(lns.shape), rep(lnb.shape),
            rep(w1.shape), rep(b1.shape), rep(w2.shape), rep(b2.shape),
            rep(ln2s.shape), rep(ln2b.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, t + pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t + pad, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(xb, wqkv, bqkv, wo, bo, lns, lnb, w1, b1, w2, b2, ln2s, ln2b)
    return out[:, :t] if pad else out


def attn_block(
    p,
    x: jnp.ndarray,
    num_heads: int,
    eps: float,
    softmax: str = "exp2",
    interpret: bool = False,
    quant: str | None = None,
) -> jnp.ndarray:
    """y = LN(x + attention(x)) over (B, T, d), post-LN layers only.

    Returns x's dtype. T pads to the sublane quantum internally; padded key
    columns are masked out of the softmax, padded rows sliced off.
    ``quant="int8"``: opt-in screening mode — every matmul runs int8xint8
    on the MXU (2x the bf16 rate) with dynamic per-row activation scales
    and per-column weight scales; out-of-contract fidelity, measured in
    tools/prof_sbs_block.py.
    """
    b, t, d = x.shape
    assert num_heads % 2 == 0 and d % num_heads == 0
    pad = (-t) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    wqkv, bqkv, wo, bo, lns, lnb = pack_attn_block_params(
        p, num_heads, softmax, quant
    )

    xb = x.astype(jnp.bfloat16)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel,
            num_heads=num_heads, t_real=t, eps=eps, softmax=softmax,
            quant=quant,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t + pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            rep(wqkv.shape),
            rep(bqkv.shape),
            rep(wo.shape),
            rep(bo.shape),
            rep(lns.shape),
            rep(lnb.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, t + pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t + pad, d), x.dtype),
        # weights + one head's fp32 logits + the bf16 qkv/context measure
        # ~22 MB of scoped VMEM at the bench shape — over the compiler's
        # 16 MB default, small next to the chip's physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xb, wqkv, bqkv, wo, bo, lns, lnb)
    return out[:, :t] if pad else out
