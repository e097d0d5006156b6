"""DNSMOS shared_exact stage decomposition at the bench shape (round 4).

Stages timed as separate chained jits (chain 32/dispatch, interleaved):
  stft    — _log_power_features
  trunk   — convs 0-5 (+pools) over the full signal, bf16
  phases  — pool3 x2 + conv6 x2
  strips  — both edge-strip stacks (the per-window exactness correction)
  full    — the whole windowed-exact graph

Run: python tools/prof_dnsmos_r4.py [rounds]
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
    _EDGE_LEFT_CELLS,
    _EDGE_RIGHT_CELLS,
    _LEFT_STRIP,
    _RIGHT_STRIP,
    _WINDOW_FRAMES,
    _conv_layer,
    _log_power_features,
    _max_pool_2x2,
    _trunk_conv0_5,
    dnsmos_net_windowed_exact,
    load_params,
)

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BATCH, DUR = 64, 16
CHAIN = 32
NUM_W = 7  # (256000 - 144160) // 16000 + 1
HOP_F = 100

params = load_params()
rng = np.random.default_rng(0)
den = jnp.asarray(0.1 * rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
feats0 = jax.jit(lambda a: _log_power_features(params, a, "highest"))(den)
bf16 = jnp.bfloat16


def stage_stft(a):
    return _log_power_features(params, a, "highest")[:, :4, :4]


def stage_trunk(f):
    return _trunk_conv0_5(params, f[..., None], None, bf16)[:, :4, :4, :4]


def stage_phases(f):
    x = _trunk_conv0_5(params, f[..., None], None, bf16)
    outs = []
    for phase in (0, 1):
        xp = x if phase == 0 else x[:, 1:, :, :]
        xp = _max_pool_2x2(xp)
        outs.append(_conv_layer(params, xp, 6, None)[:, :2, :2, :2])
    return outs[0] + outs[1]


def stage_strips(f):
    batch = f.shape[0]

    def edge_cells(start, length):
        strip = jnp.stack(
            [
                f[:, k * HOP_F + start : k * HOP_F + start + length]
                for k in range(NUM_W)
            ],
            axis=1,
        ).reshape(batch * NUM_W, length, f.shape[2])
        z = _trunk_conv0_5(params, strip[..., None], None, bf16)
        z = _max_pool_2x2(z)
        return _conv_layer(params, z, 6, None)

    left = edge_cells(0, _LEFT_STRIP)[:, :_EDGE_LEFT_CELLS]
    right = edge_cells(_WINDOW_FRAMES - _RIGHT_STRIP, _RIGHT_STRIP)[:, -_EDGE_RIGHT_CELLS:]
    return jnp.max(left, axis=(1, 2)) + jnp.max(right, axis=(1, 2))


def stage_full(a):
    return dnsmos_net_windowed_exact(params, a, NUM_W, HOP_F, None, bf16)


def chain_sig(fn, x):
    @jax.jit
    def run(x, seed):
        s = 1.0 + seed * 1e-9
        out = None
        for _ in range(CHAIN):
            out = fn(x * s)
            s = 1.0 + jnp.abs(out.reshape(-1)[0]) * 1e-12
        return out.reshape(-1)[:2]

    return lambda i: np.asarray(run(x, jnp.float32(i)))


CALLS = {
    "stft": chain_sig(stage_stft, den),
    "trunk": chain_sig(stage_trunk, feats0),
    "trunk+phases": chain_sig(stage_phases, feats0),
    "strips": chain_sig(stage_strips, feats0),
    "full": chain_sig(stage_full, den),
}

for name, call in CALLS.items():
    t0 = time.perf_counter()
    call(0)
    print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in CALLS}
for r in range(ROUNDS):
    for name, call in CALLS.items():
        t0 = time.perf_counter()
        call(r + 1)
        dt = (time.perf_counter() - t0) / CHAIN * 1e3
        results[name].append(dt)
        print(f"round {r} {name:14s} {dt:7.2f} ms/eval", flush=True)

print()
for name, ts in results.items():
    print(f"MEDIAN {name:14s} {sorted(ts)[len(ts)//2]:7.2f} ms/eval", flush=True)
