"""Chained timing of the whole-signal fused LSD kernel (and framed fallback).

Run: python tools/prof_lsd_ws.py
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

from fast_speech_enhancement_metrics_tpu.ops import lsd_fused

BATCH, DUR = 64, 16
AUD = BATCH * DUR
N_FFT, HOP, EPS = 512, 256, 1e-8
CHAIN_K = 128

rng = np.random.default_rng(0)
c_sig = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
d_sig = jnp.asarray(
    np.asarray(c_sig) + 0.3 * rng.standard_normal(c_sig.shape), dtype=jnp.float32
)


def chain(fn):
    @jax.jit
    def run(c, d):
        def body(eps, _):
            s = jnp.sum(fn(c + eps, d))
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return run


fns = {
    "wholesig": chain(
        lambda c, d: lsd_fused._lsd_wholesig(c, d, N_FFT, HOP, EPS, "high", False)
    ),
    "framed": chain(
        lambda c, d: lsd_fused._lsd_framed(c, d, N_FFT, HOP, EPS, 256, "high", False)
    ),
}
for r in range(2):
    for name, fn in fns.items():
        np.asarray(fn(c_sig, d_sig))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = np.asarray(fn(c_sig, d_sig))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(
            f"{name:9s} {t * 1e3:6.2f} ms/eval -> {AUD / t:8.0f} audio-s/s "
            f"(out={out[0]:.4f})",
            flush=True,
        )
