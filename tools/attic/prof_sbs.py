"""Component-ablation timing for SpeechBERTScore on the real chip.

Times cumulative pipeline stages (feature extractor -> projection+pos-conv ->
+N encoder layers -> F1) with the forced-host-fetch protocol, RPC overhead
reported separately. Identifies where the 16 s x batch-16 encoder chunk
spends its time so optimization is profile-driven (VERDICT r1 items 2/9).

Run: python tools/prof_sbs.py [batch] [seconds]
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
    _conv1d,
    _encoder_layer,
    _layer_norm,
    feature_encoder,
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
    out = np.asarray(jax.jit(fn)(*args))  # compile+warm (fetch forces completion)
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(jfn(*args))
    return (time.perf_counter() - t0) / reps, out


# RPC overhead baseline
tiny = lambda a: (a[:1, :1] + 1.0)
rpc, _ = timed(tiny, audio)
print(f"rpc round-trip                      {rpc*1e3:8.2f} ms", flush=True)

prec = "default"


def upto(n_layers, impl="einsum"):
    def fn(a):
        x = feature_encoder(params, a, cfg, prec)
        fp = params["feature_projection"]
        x = _layer_norm(x, fp["ln_s"], fp["ln_b"], cfg.layer_norm_eps)
        x = jnp.einsum("btc,cd->btd", x, fp["w"], precision=prec) + fp["b"]
        pos = _conv1d(
            x,
            params["pos_conv"]["w"],
            padding=[(cfg.num_conv_pos_embeddings // 2,) * 2],
            groups=cfg.num_conv_pos_embedding_groups,
            precision=prec,
        )
        if cfg.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1, :]
        x = x + jax.nn.gelu(pos + params["pos_conv"]["b"], approximate=False)
        enc = params["encoder_ln"]
        x = _layer_norm(x, enc["s"], enc["b"], cfg.layer_norm_eps)
        for p in params["layers"][:n_layers]:
            x = _encoder_layer(p, x, cfg, prec, impl)
        return x[:, ::97, ::97]  # small fetch, forces everything

    return fn


fe_only = lambda a: feature_encoder(params, a, cfg, prec)[:, ::97, ::97]
t, _ = timed(fe_only, audio)
print(f"feature extractor only              {(t-rpc)*1e3:8.2f} ms", flush=True)

for n in (0, 2, 4, 8):
    t, _ = timed(upto(n), audio)
    print(f"+proj/pos-conv +{n} layers (einsum)  {(t-rpc)*1e3:8.2f} ms", flush=True)

t, _ = timed(upto(8, "flash"), audio)
print(f"+proj/pos-conv +8 layers (flash)    {(t-rpc)*1e3:8.2f} ms", flush=True)

aud_s = BATCH * DUR
print(f"\nbatch={BATCH} dur={DUR}s -> audio-s per dispatch: {aud_s}", flush=True)
