"""Stage timing for SpeechBERTScore's benchmarked config (bf16 activations).

Cumulative stages of hubert_hidden_state with act_dtype=bfloat16 (the
benchmark default since round 2): feature extractor alone, then +proj/pos
+N encoder layers. Forced host fetch; RPC reported separately.

Run: python tools/prof_sbs_r2.py [batch] [seconds]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
T = DUR * 16000
cfg = MHUBERT_147_CONFIG
params = init_params(jax.random.key(0), cfg)
audio = jnp.asarray(
    np.random.default_rng(0).standard_normal((BATCH, T)), dtype=jnp.float32
)


def timed(fn, *args, reps=5):
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))  # compile+warm (fetch forces completion)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(jfn(*args))
    return (time.perf_counter() - t0) / reps, out


tiny = lambda a: (a[:1, :1] + 1.0)
rpc, _ = timed(tiny, audio)
print(f"rpc round-trip                      {rpc*1e3:8.2f} ms", flush=True)

bf16_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def fe_only(a):
    return feature_encoder(bf16_params, a.astype(jnp.bfloat16), cfg, "default")[
        :, ::97, ::97
    ].astype(jnp.float32)


t, _ = timed(fe_only, audio)
print(f"feature extractor only (bf16)       {(t-rpc)*1e3:8.2f} ms", flush=True)

# individual conv layers of the FE, cumulative
for n_conv in (1, 2, 3, 5):
    def fe_part(a, n_conv=n_conv):
        x = a.astype(jnp.bfloat16)[..., None]
        from fast_speech_enhancement_metrics_tpu.models.hubert import _conv1d
        for i in range(n_conv):
            layer = bf16_params["feature_encoder"][i]
            x = _conv1d(x, layer["w"], stride=cfg.conv_stride[i], precision="default")
            if cfg.feat_extract_norm == "group" and i == 0:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=1, keepdims=True)
                var = jnp.var(xf, axis=1, keepdims=True)
                xf = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
                x = (
                    xf * layer["norm_scale"].astype(jnp.float32)
                    + layer["norm_bias"].astype(jnp.float32)
                ).astype(x.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return x[:, ::97, ::97].astype(jnp.float32)

    t, _ = timed(fe_part, audio)
    print(f"FE convs 0..{n_conv-1} (bf16)             {(t-rpc)*1e3:8.2f} ms", flush=True)


def upto(n_layers):
    def fn(a):
        x = hubert_hidden_state(
            params, a, cfg, output_layer=n_layers, precision="default",
            act_dtype=jnp.bfloat16,
        )
        return x[:, ::97, ::97]

    return fn


for n in (0, 2, 4, 8):
    t, _ = timed(upto(n), audio)
    print(f"full pipe, {n} encoder layers        {(t-rpc)*1e3:8.2f} ms", flush=True)

aud_s = BATCH * DUR
print(f"\nbatch={BATCH} dur={DUR}s -> audio-s per dispatch: {aud_s}", flush=True)
