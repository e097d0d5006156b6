"""Clean SBS stage split with loop-carried chained dispatch (RPC amortized).

Times, at the bench configuration (bf16 activations, tanh GELU, einsum
attention, rows = 2*batch):
  fe     — conv feature extractor alone
  enc    — full encoder (fe + projection + pos-conv + 8 layers)
  metric — full _compute (encoder on 2B rows + similarity/F1)

Run on an idle host: python tools/prof_sbs_fe.py [batch] [dur]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    feature_encoder,
    hubert_hidden_state,
    init_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
AUD = BATCH * DUR
CHAIN_K = 8

rng = np.random.default_rng(0)
clean = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
den = jnp.asarray(
    np.asarray(clean) + 0.3 * rng.standard_normal(clean.shape), dtype=jnp.float32
)
params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)
params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
metric = SpeechBERTScore(params=params, act_dtype=jnp.bfloat16)
speech = jnp.concatenate([clean, den], axis=0).astype(jnp.bfloat16)


def fe_only(x):
    out = feature_encoder(params_bf16, x, MHUBERT_147_CONFIG, None, gelu="tanh")
    return jnp.sum(out.astype(jnp.float32)[:, ::64, ::64])


def enc_only(x):
    out = hubert_hidden_state(
        params, x.astype(jnp.float32), MHUBERT_147_CONFIG,
        output_layer=8, precision="default", attention_impl="einsum",
        act_dtype=jnp.bfloat16, gelu="tanh",
    )
    return jnp.sum(out[:, ::64, ::64])


def full_metric(x):
    scores = metric._compute(x[:BATCH].astype(jnp.float32), x[BATCH:].astype(jnp.float32))
    return jnp.sum(scores["SpeechBERTScore"])


def chain(fn):
    @jax.jit
    def run(x):
        def body(eps, _):
            s = fn(x * (1.0 + eps).astype(x.dtype))
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return run


rows = [("fe", chain(fe_only)), ("enc", chain(enc_only)), ("metric", chain(full_metric))]
for r in range(2):
    for name, fn in rows:
        np.asarray(fn(speech))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = np.asarray(fn(speech))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(f"{name:7s} {t * 1e3:7.1f} ms/eval (out={out[0]:.3f})", flush=True)
