"""Per-layer DNSMOS conv-trunk timing: cumulative prefixes, scalar outputs.

Each prefix jit returns jnp.sum of its last activation so the relay fetch is
one scalar; consecutive differences give per-layer device cost. Also times a
shifted-matmul formulation of the 3x3 convs for comparison with XLA's
lowering.

Run: python tools/prof_dnsmos_layers.py [batch] [dur]
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
    load_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
AUD = BATCH * DUR
PRECISION = "default"

params = load_params()
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)

#: trunk stages in execution order: (name, fn)
STAGES = [
    ("conv0", lambda z: _conv_layer(params, z, 0, PRECISION)),
    ("conv1", lambda z: _conv_layer(params, z, 1, PRECISION)),
    ("conv2", lambda z: _conv_layer(params, z, 2, PRECISION)),
    ("conv3", lambda z: _conv_layer(params, z, 3, PRECISION)),
    ("pool1", _max_pool_2x2),
    ("conv4", lambda z: _conv_layer(params, z, 4, PRECISION)),
    ("pool2", _max_pool_2x2),
    ("conv5", lambda z: _conv_layer(params, z, 5, PRECISION)),
]


def prefix(n):
    @jax.jit
    def run(a):
        z = _log_power_features(params, a, "highest")[..., None].astype(jnp.bfloat16)
        for _, fn in STAGES[:n]:
            z = fn(z)
        return jnp.sum(z.astype(jnp.float32))

    return run


def timeit(fn, reps=8):
    np.asarray(fn(audio))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(audio))
    return (time.perf_counter() - t0) / reps


times = []
for n in range(len(STAGES) + 1):
    t = timeit(prefix(n))
    name = "feats" if n == 0 else STAGES[n - 1][0]
    delta = (t - times[-1]) * 1e3 if times else 0.0
    times.append(t)
    print(f"prefix<*..{name:6s}> {t * 1e3:8.2f} ms   (+{delta:6.2f} ms)", flush=True)


def shifted_conv(z, w, b):
    """3x3 SAME conv over NHWC as 9 shifted einsums (freq-padded views)."""
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    th, fw = z.shape[1], z.shape[2]
    out = None
    for dy in range(3):
        for dx in range(3):
            part = jnp.einsum(
                "bthc,cd->bthd",
                zp[:, dy : dy + th, dx : dx + fw, :],
                w[dy, dx],
            )
            out = part if out is None else out + part
    return jnp.maximum(out + b, 0.0).astype(z.dtype)


@jax.jit
def shifted_prefix(a):
    z = _log_power_features(params, a, "highest")[..., None].astype(jnp.bfloat16)
    for n in range(4):
        z = shifted_conv(z, params[f"conv{n}_w"], params[f"conv{n}_b"])
    z = _max_pool_2x2(z)
    z = shifted_conv(z, params["conv4_w"], params["conv4_b"])
    z = _max_pool_2x2(z)
    z = shifted_conv(z, params["conv5_w"], params["conv5_b"])
    return jnp.sum(z.astype(jnp.float32))


t = timeit(shifted_prefix)
print(f"shifted-matmul trunk {t * 1e3:8.2f} ms  (xla conv trunk: {times[-1] * 1e3:.2f})", flush=True)
