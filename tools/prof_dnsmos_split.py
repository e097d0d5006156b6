"""DNSMOS trunk batch-split probe: (64, 1600) vs (128, 816) vs (256, 424).

The batch sweep showed DNSMOS per-item cost FALLING with batch (2.66 ms at
b64 vs 2.0 ms at b128) — if XLA's conv efficiency improves with batch rows,
splitting each utterance's time axis into 2-4 batch rows (+8-frame halos to
keep pool grids aligned) could buy the same effect at batch 64. Deep-chain
timing of trunk_0_5 at equivalent-work shapes.

Run: python tools/prof_dnsmos_split.py
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

from fast_speech_enhancement_metrics_tpu.models.dnsmos_net import (
    _conv_layer,
    _max_pool_2x2,
    load_params,
)

params = load_params()
CHAIN_K = 64


def trunk(z):
    z = z.astype(jnp.bfloat16)
    for n in range(4):
        z = _conv_layer(params, z, n, "default")
    z = _max_pool_2x2(z)
    z = _conv_layer(params, z, 4, "default")
    z = _max_pool_2x2(z)
    return _conv_layer(params, z, 5, "default")


def chain(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape + (161, 1)), dtype=jnp.float32)

    @jax.jit
    def run(x):
        def body(eps, _):
            s = jnp.sum(trunk(x + eps).astype(jnp.float32)[:, ::64, ::8])
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return x, run


shapes = [(64, 1600), (128, 816), (256, 424), (512, 228)]
fns = {s: chain(s) for s in shapes}
for r in range(2):
    for shape, (x, fn) in fns.items():
        np.asarray(fn(x))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            np.asarray(fn(x))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        positions = shape[0] * shape[1]
        print(
            f"round {r} {str(shape):12s} {t * 1e3:7.2f} ms/eval "
            f"({t / positions * 1e9:5.1f} ns/position)",
            flush=True,
        )
