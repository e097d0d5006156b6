"""Max-pool A/B: lax.reduce_window vs reshape-max, at DNSMOS pool1's shape.

The layer probe (tools/prof_dnsmos_layers.py) measured pool1 at ~9.7 ms for
~2 GB of traffic (~2.4 ms at HBM speed). Chained timing of both lowerings.

Run: python tools/prof_pool_ab.py
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

x = jnp.asarray(
    np.random.default_rng(0).standard_normal((64, 1600, 161, 32)), dtype=jnp.bfloat16
)


def pool_reduce_window(x):
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    return lax.reduce_window(
        x[:, :h, :w, :],
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def pool_reshape(x):
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    v = x[:, :h, :w, :].reshape(x.shape[0], h // 2, 2, w // 2, 2, x.shape[3])
    return jnp.max(jnp.max(v, axis=4), axis=2)


def pool_slices(x):
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    v = x[:, :h, :w, :]
    return jnp.maximum(
        jnp.maximum(v[:, 0::2, 0::2], v[:, 0::2, 1::2]),
        jnp.maximum(v[:, 1::2, 0::2], v[:, 1::2, 1::2]),
    )


def chain(fn, k=16):
    @jax.jit
    def run(x):
        def body(eps, _):
            s = jnp.max(fn(x + eps)).astype(jnp.float32)
            return (s * jnp.float32(1e-30)).astype(x.dtype), s

        _, outs = jax.lax.scan(body, jnp.asarray(0, x.dtype), None, length=k)
        return outs

    return lambda: np.asarray(run(x))


fns = {
    "reduce_window": chain(pool_reduce_window),
    "reshape": chain(pool_reshape),
    "slices": chain(pool_slices),
}
for name, fn in fns.items():
    fn()
    t0 = time.perf_counter()
    for _ in range(4):
        fn()
    t = (time.perf_counter() - t0) / 4 / 16
    print(f"{name:14s} {t * 1e3:6.2f} ms/pool", flush=True)
