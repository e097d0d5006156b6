"""Decompose DNSMOS shared_exact time: features / trunk / phases / edge strips.

Each stage jitted separately with forced host fetches; differences vs the full
graph show fusion seams. Run on an idle host.

Run: python tools/prof_dnsmos_r3.py [batch] [dur]
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
    _log_power_features,
    _max_pool_2x2,
    dnsmos_net_windowed_exact,
    load_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
AUD = BATCH * DUR
PRECISION = "default"
CONV_DTYPE = jnp.bfloat16

params = load_params()
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
NUM_WINDOWS = (audio.shape[1] - 144160) // 16000 + 1
FRAMES_PER_HOP = 100


def trunk_0_5(z):
    z = z.astype(CONV_DTYPE)
    for n in range(4):
        z = _conv_layer(params, z, n, PRECISION)
    z = _max_pool_2x2(z)
    z = _conv_layer(params, z, 4, PRECISION)
    z = _max_pool_2x2(z)
    return _conv_layer(params, z, 5, PRECISION)


@jax.jit
def stage_feats(a):
    return _log_power_features(params, a, "highest")


@jax.jit
def stage_trunk(a):
    x = trunk_0_5(stage_feats(a)[..., None])
    return x.astype(jnp.float32)[:, :1, :1, :1]


@jax.jit
def stage_phases(a):
    x = trunk_0_5(stage_feats(a)[..., None])
    outs = []
    for phase in (0, 1):
        xp = x if phase == 0 else x[:, 1:, :, :]
        xp = _max_pool_2x2(xp)
        outs.append(_conv_layer(params, xp, 6, PRECISION)[:, :1, :1, :1])
    return (outs[0] + outs[1]).astype(jnp.float32)


@jax.jit
def stage_edges(a):
    feats = stage_feats(a)
    batch = feats.shape[0]

    def edge_cells(start, length):
        strip = jnp.stack(
            [
                feats[:, k * FRAMES_PER_HOP + start : k * FRAMES_PER_HOP + start + length]
                for k in range(NUM_WINDOWS)
            ],
            axis=1,
        ).reshape(batch * NUM_WINDOWS, length, feats.shape[2])
        z = trunk_0_5(strip[..., None])
        z = _max_pool_2x2(z)
        return _conv_layer(params, z, 6, PRECISION)

    left = edge_cells(0, 48)
    right = edge_cells(900 - 44, 44)
    return (jnp.max(left) + jnp.max(right)).astype(jnp.float32)


@jax.jit
def full(a):
    return dnsmos_net_windowed_exact(
        params, a, NUM_WINDOWS, FRAMES_PER_HOP, PRECISION, CONV_DTYPE
    )


def timeit(name, fn, reps=8):
    np.asarray(fn(audio))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(fn(audio))
    t = (time.perf_counter() - t0) / reps
    print(f"{name:10s} {t * 1e3:8.2f} ms -> {AUD / t:7.0f} audio-s/s", flush=True)
    return t


for _ in range(2):
    timeit("feats", stage_feats)
    timeit("trunk", stage_trunk)
    timeit("phases", stage_phases)
    timeit("edges", stage_edges)
    timeit("full", full)
