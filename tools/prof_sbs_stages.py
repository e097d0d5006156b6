"""SpeechBERTScore stage-level on-chip profile.

Splits the benchmarked configuration's time into: conv feature extractor,
transformer stack (8 layers), similarity/F1 — plus attention-impl and
flash block-size probes at the production 16 s length. Each stage is
jitted separately in a dependency chain (xN) to amortize the relay RPC.

Run: python tools/prof_sbs_stages.py [batch] [dur]
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

from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    feature_encoder,
    hubert_hidden_state,
    init_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128  # clean+denoised rows
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CFG = MHUBERT_147_CONFIG

rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)) * 0.1, jnp.float32)
params = init_params(jax.random.key(0), CFG)
params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def timed(name, fn, reps=3):
    out = fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    t = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {t*1e3:9.1f} ms", flush=True)
    return out


def chain(f, x, n=4):
    @jax.jit
    def run(x):
        y = None
        for i in range(n):
            y = f(x * (1.0 + 1e-9 * i))
            x = x * (1.0 + jnp.abs(y.astype(jnp.float32)).max() * 1e-20)
        return y[..., :4].astype(jnp.float32)

    return lambda: np.asarray(run(x)), n


# full encoder (bench config: bf16 activations, einsum attention)
fn, n = chain(
    lambda a: hubert_hidden_state(
        params, a, CFG, output_layer=8, precision="default",
        attention_impl="einsum", act_dtype=jnp.bfloat16,
    ),
    audio, n=2,
)
timed(f"encoder e2e (bf16 act, einsum) /{n}", fn)

# conv feature extractor alone
fn, n = chain(
    lambda a: feature_encoder(params_bf16, a.astype(jnp.bfloat16), CFG, None),
    audio, n=2,
)
timed(f"feature extractor (bf16) /{n}", fn)

# transformer stack alone on fake conv features
frames = DUR * 16000 // 320
feat = jnp.asarray(
    rng.standard_normal((BATCH, frames, CFG.conv_dim[-1])) * 0.1, jnp.float32
)


def transformer_only(x, impl):
    from fast_speech_enhancement_metrics_tpu.models import hubert as hb

    p = params_bf16
    xx = x
    xx = hb._layer_norm(
        xx, p["feature_projection"]["ln_s"], p["feature_projection"]["ln_b"],
        CFG.layer_norm_eps,
    )
    xx = jnp.einsum("btc,cd->btd", xx, p["feature_projection"]["w"]) + p[
        "feature_projection"
    ]["b"]
    xx = hb._layer_norm(xx, p["encoder_ln"]["s"], p["encoder_ln"]["b"], CFG.layer_norm_eps)
    for lp in p["layers"][:8]:
        xx = hb._encoder_layer(lp, xx, CFG, None, impl)
    return xx


for impl in ("einsum", "flash"):
    fn, n = chain(
        lambda x, impl=impl: transformer_only(x.astype(jnp.bfloat16), impl),
        feat, n=2,
    )
    timed(f"transformer 8L (bf16, {impl}) /{n}", fn)

# one encoder layer microstages at production shape
hid = jnp.asarray(
    rng.standard_normal((BATCH, frames, CFG.hidden_size)) * 0.1, jnp.bfloat16
)
from fast_speech_enhancement_metrics_tpu.models import hubert as hb

lp = params_bf16["layers"][0]
fn, n = chain(lambda x: hb._encoder_layer(lp, x, CFG, None, "einsum"), hid, n=8)
timed(f"1 layer (einsum) /{n}", fn)
fn, n = chain(lambda x: hb._attention(lp, x, CFG.num_attention_heads, None, "einsum"), hid, n=8)
timed(f"1 attention (einsum) /{n}", fn)
fn, n = chain(lambda x: hb._attention(lp, x, CFG.num_attention_heads, None, "flash"), hid, n=8)
timed(f"1 attention (flash) /{n}", fn)


def mlp_only(x):
    h = jax.nn.gelu(jnp.matmul(x, lp["ff_w1"]) + lp["ff_b1"], approximate=False)
    return jnp.matmul(h, lp["ff_w2"]) + lp["ff_b2"]


fn, n = chain(mlp_only, hid, n=8)
timed(f"1 MLP (erf gelu) /{n}", fn)


def mlp_tanh(x):
    h = jax.nn.gelu(jnp.matmul(x, lp["ff_w1"]) + lp["ff_b1"], approximate=True)
    return jnp.matmul(h, lp["ff_w2"]) + lp["ff_b2"]


fn, n = chain(mlp_tanh, hid, n=8)
timed(f"1 MLP (tanh gelu) /{n}", fn)

# per-conv-layer feature extractor breakdown
x = audio[..., None].astype(jnp.bfloat16)
for i, layer in enumerate(params_bf16["feature_encoder"]):
    stride = CFG.conv_stride[i]

    def one(xx, layer=layer, stride=stride):
        return hb._conv1d(xx, layer["w"], stride=stride)

    fn, n = chain(one, x, n=4)
    out = timed(f"conv L{i} k={CFG.conv_kernel[i]} s={stride} in={x.shape} /{n}", fn)
    x = hb._conv1d(x, layer["w"], stride=stride)
    x = jax.nn.gelu(x, approximate=False)
