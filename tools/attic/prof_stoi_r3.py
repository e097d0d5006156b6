"""STOI stage re-profile (post precision drops + block resample).

Cumulative stages with forced host fetch; RPC reported separately.
Run: python tools/prof_stoi_r3.py [batch] [dur]
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

from fast_speech_enhancement_metrics_tpu.metrics.stoi import STOI
from fast_speech_enhancement_metrics_tpu.ops.resample import resample

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
T = DUR * 16000
rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, T)), dtype=jnp.float32)
d = jnp.asarray(c + 0.3 * rng.standard_normal((BATCH, T)), dtype=jnp.float32)

m = STOI(sample_rate=16000)


def timed(fn, *args, reps=5):
    jfn = jax.jit(fn)
    jax.tree.map(np.asarray, jfn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.tree.map(np.asarray, jfn(*args))
    return (time.perf_counter() - t0) / reps


rpc = timed(lambda a: a[:1, :1] + 1.0, c)
print(f"rpc                        {rpc*1e3:8.2f} ms", flush=True)

t = timed(
    lambda a, b: tuple(
        x[:, ::997] for x in (resample(a, 16000, 10000, "high"),
                              resample(b, 16000, 10000, "high"))
    ),
    c, d,
)
print(f"resample (high) x2         {(t-rpc)*1e3:8.2f} ms", flush=True)


def upto_silent(a, b):
    a = resample(a, 16000, 10000, "high")
    b = resample(b, 16000, 10000, "high")
    cc, dd, lengths = m._remove_silent_frames(a, b)
    return cc[:, ::997], dd[:, ::997], lengths


t = timed(upto_silent, c, d)
print(f"+ remove_silent_frames     {(t-rpc)*1e3:8.2f} ms", flush=True)


def upto_env(a, b):
    a = resample(a, 16000, 10000, "high")
    b = resample(b, 16000, 10000, "high")
    cc, dd, lengths = m._remove_silent_frames(a, b)
    both = jnp.concatenate([cc, dd], axis=0)
    tob = m._band_envelopes(both, jnp.concatenate([lengths, lengths]))
    return tob[:, ::37, :]


t = timed(upto_env, c, d)
print(f"+ band envelopes (DFT)     {(t-rpc)*1e3:8.2f} ms", flush=True)

t = timed(lambda a, b: m._compute_resampled(a, b)["STOI"], c, d)
full = t - rpc
print(f"full STOI                  {full*1e3:8.2f} ms -> {BATCH*DUR/full:,.0f} audio-s/s", flush=True)
