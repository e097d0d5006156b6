"""Single-pass scaled-dot-product attention as a Pallas TPU kernel.

At SpeechBERTScore's sequence lengths (16 s audio = 799 encoder frames; even
multi-minute clips stay in the low thousands) one head's full K and V fit in
VMEM many times over, so attention needs neither the flash algorithm's online
softmax nor its multi-pass block accumulators: each grid step loads one query
block plus the head's whole K/V, computes the (BQ, T) logits in VMEM,
softmaxes, and emits the context block. The XLA einsum path materializes the
(B, H, T, T) logits AND the softmax weights in HBM — ~8 GB of round-trips per
layer at the bench shape (B*2=128, T=799) — which this kernel never writes.
Measured vs alternatives at that shape: einsum ~3.7 k audio-s/s end-to-end,
jax's upstream flash kernel ~1.6 k; this kernel exists because the sweep in
tools/prof_sbs_attn.py showed both leave the attention stage HBM- or
overhead-bound.

Reference role: the fp16 `torch` SDPA inside HF HuBERT's attention
(reference: fast_se_metrics/SpeechBERTScore.py:25-51 runs the HF encoder
under autocast); this is the TPU-first re-design, not a port.

Numerics: QK^T accumulates fp32 on the MXU (the einsum path emits bf16
logits when the activation stream is bf16 — this kernel is slightly
tighter), softmax runs fp32 in VMEM, and the probability matrix is cast to
the value dtype for the AV matmul, matching the einsum path's class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sdpa_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, softmax: str):
    q = q_ref[0]  # (BQ, D)  pre-scaled by 1/sqrt(D) (and log2 e for exp2 modes)
    k = k_ref[0]  # (TK, D)
    v = v_ref[0]  # (TK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, TK) fp32, never leaves VMEM
    if t_real < s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_real, s, -jnp.inf)
    if softmax == "exact":
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
    elif softmax == "exp2":
        # q arrives pre-scaled by log2(e): softmax(x) = 2^x2 / sum 2^x2 with
        # x2 = x*log2(e) — one native exponential, no max pass. The clamp
        # maps masked -inf columns to 2^-100 ~ 0 and bounds the row sum:
        # at +60, even 40k columns pinned at the clamp give l <= 2^76, far
        # from fp32 inf (normalization cancels any shared offset, so the
        # clamp costs nothing until per-row logit SPREAD exceeds 60 bits —
        # measured |logits*log2e| on the mHuBERT-class encoder is ~30,
        # tools/prof_sbs_softmax.py; the per-model bound assumption is
        # documented in docs/PARITY.md)
        p = jnp.exp2(jnp.clip(s, -100.0, 60.0))
    else:  # "exp2_bf16": the exponential and the AV matmul operand in bf16
        p = jnp.exp2(jnp.clip(s, -100.0, 60.0).astype(jnp.bfloat16))
    l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, D)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scaling: float,
    block_q: int | None = None,
    interpret: bool = False,
    softmax: str = "exact",
) -> jnp.ndarray:
    """Softmax((q*scaling) @ k^T) @ v over (B, H, T, D) inputs, non-causal.

    Returns (B, H, T, D) in the query dtype. T is padded internally to the
    lane/block quantum; padded key positions are masked out of the softmax,
    padded query rows are sliced off. ``block_q`` defaults to the largest
    power-of-two block (<= 512) whose fp32 logits tile stays within ~4 MB of
    VMEM, so long sequences (the regime where the einsum path's (B, H, T, T)
    logits exceed HBM) shrink the query block instead of failing.

    ``softmax``: "exact" (max-subtracted fp32 — the torch class), "exp2"
    (no max pass, one native fp32 exponential — exact in infinite
    precision, requires |logits| < ~85), "exp2_bf16" (additionally the
    exponential and AV operand in bf16). Deviation + speed characterized in
    tools/prof_sbs_softmax.py.
    """
    b, h, t, d = q.shape
    assert k.shape == v.shape == (b, h, t, d)
    assert softmax in ("exact", "exp2", "exp2_bf16")
    tk = -(-t // 128) * 128
    if block_q is None:
        block_q = 512
        while block_q > 32 and block_q * tk * 4 > 4 * 1024 * 1024:
            block_q //= 2
    bq = min(block_q, tk)
    tq = -(-t // bq) * bq

    if softmax != "exact":
        scaling = scaling * 1.4426950408889634  # log2(e): exp(x) = 2^(x log2 e)
    qs = (q * jnp.asarray(scaling, q.dtype)).reshape(b * h, t, d)
    ks = k.reshape(b * h, t, d)
    vs = v.reshape(b * h, t, d)
    if tq > t:
        qs = jnp.pad(qs, ((0, 0), (0, tq - t), (0, 0)))
    if tk > t:
        ks = jnp.pad(ks, ((0, 0), (0, tk - t), (0, 0)))
        vs = jnp.pad(vs, ((0, 0), (0, tk - t), (0, 0)))

    kv_spec = pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sdpa_kernel, t_real=t, softmax=softmax),
        grid=(b * h, tq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        interpret=interpret,
    )(qs, ks, vs)
    return out[:, :t].reshape(b, h, t, d)
