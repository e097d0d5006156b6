"""STOI stage split at honest chain depth (K=128).

Cumulative prefixes of the STOI pipeline: resample 16k->10k, silent-frame
removal, center-half band DFT, segment correlations (Pallas kernel).
Differences between rows are stage costs; run on an idle host.

Run: python tools/prof_stoi_stages.py
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

from fast_speech_enhancement_metrics_tpu import STOI
from fast_speech_enhancement_metrics_tpu.ops.resample import resample

BATCH, DUR = 64, 16
AUD = BATCH * DUR
CHAIN_K = 128

rng = np.random.default_rng(0)
clean = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
noisy = jnp.asarray(
    np.asarray(clean) + 0.3 * rng.standard_normal(clean.shape), dtype=jnp.float32
)
metric = STOI()


def stage_resample(c, d):
    rc = resample(c, 16000, 10000, "high")
    rd = resample(d, 16000, 10000, "high")
    return jnp.sum(rc[:, ::977]) + jnp.sum(rd[:, ::977])


def stage_full(c, d):
    return jnp.sum(sum(v for v in metric._compute_resampled(c, d).values()))


def chain(fn):
    @jax.jit
    def run(c, d):
        def body(eps, _):
            s = fn(c + eps, d)
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return run


rows = [("resample", chain(stage_resample)), ("full", chain(stage_full))]
for r in range(2):
    for name, fn in rows:
        np.asarray(fn(clean, noisy))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = np.asarray(fn(clean, noisy))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(
            f"round {r} {name:9s} {t * 1e3:6.2f} ms/eval -> {AUD / t:7.0f} audio-s/s",
            flush=True,
        )
