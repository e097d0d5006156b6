"""SBS feature-extractor per-layer decomposition (round 4).

The FE measures ~70 ms/eval at the bench shape vs a ~51 ms conv-matmul
floor, and the conv0 K-starvation hypothesis was refuted (packing it
measured negative). This probe times cumulative prefixes of the FE stack
(conv0; +GN+GELU; +conv1; ... +conv6) as separate chained jits
(chain 16, interleaved) to localize the gap.

Run: python tools/prof_sbs_fe_layers.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG as CFG,
)
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    _conv1d,
    init_params,
)

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
CHAIN = 16
ROWS, T = 32, 256000  # quarter batch: full-size chains OOM; scale x4

params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16),
    init_params(jax.random.key(0), CFG)["feature_encoder"],
)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((ROWS, T)), jnp.bfloat16)


def fe_prefix(x, n_layers, with_gn=True):
    """First n_layers convs of the FE (bf16 stream, tanh GELU)."""
    x = x[..., None]
    for i in range(n_layers):
        x = _conv1d(x, params[i]["w"], stride=CFG.conv_stride[i], precision=None)
        if i == 0 and with_gn:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
            var = jnp.maximum(var, 0.0)
            xf = (xf - mean) * lax.rsqrt(var + CFG.layer_norm_eps)
            x = (
                xf * params[0]["norm_scale"].astype(jnp.float32)
                + params[0]["norm_bias"].astype(jnp.float32)
            ).astype(x.dtype)
        if i > 0 or with_gn:
            x = jax.nn.gelu(x, approximate=True)
    return x


STAGES = {
    "conv0 only": lambda x: fe_prefix(x, 1, with_gn=False),
    "conv0+gn+gelu": lambda x: fe_prefix(x, 1),
    "thru conv1": lambda x: fe_prefix(x, 2),
    "thru conv2": lambda x: fe_prefix(x, 3),
    "thru conv4": lambda x: fe_prefix(x, 5),
    "thru conv6 (full FE)": lambda x: fe_prefix(x, 7),
}


def chain(fn):
    @jax.jit
    def run(a, seed):
        s = (1.0 + seed * 1e-6).astype(jnp.bfloat16)
        out = None
        for _ in range(CHAIN):
            out = fn(a * s)
            s = (1.0 + jnp.abs(out[0, 0, 0].astype(jnp.float32)) * 1e-9).astype(
                jnp.bfloat16
            )
        return out[0, 0, :2]

    return lambda i: np.asarray(run(audio, jnp.bfloat16(i)))


calls = {k: chain(v) for k, v in STAGES.items()}
for name, call in calls.items():
    t0 = time.perf_counter()
    call(0)
    print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in calls}
for r in range(ROUNDS):
    for name, call in calls.items():
        t0 = time.perf_counter()
        call(r + 1)
        results[name].append((time.perf_counter() - t0) / CHAIN * 1e3)
        print(f"round {r} {name:22s} {results[name][-1]:7.2f} ms", flush=True)

print()
for name, ts in results.items():
    print(f"MEDIAN {name:22s} {sorted(ts)[len(ts)//2]:7.2f} ms", flush=True)
