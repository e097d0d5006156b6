"""Interleaved A/B: padded whole-signal LSD (pre-scaled signal, pad copies)
vs the zero-copy raw-chunk kernel (scale applied in VMEM).

Both sides time the FULL metric graph (projection scale included), chained
CHAIN_K evals per dispatch per the probe-hygiene checklist (CLAUDE.md).

Run: python tools/prof_lsd_raw.py
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


def _scale(c, d):
    return jnp.sum(c * d, axis=1, keepdims=True) / (
        jnp.sum(d * d, axis=1, keepdims=True) + EPS
    )


def padded(c, d):
    d = d * _scale(c, d)
    return lsd_fused._lsd_wholesig(c, d, N_FFT, HOP, EPS, "high", False)


def raw(c, d):
    s = _scale(c, d)
    return lsd_fused._lsd_wholesig_raw(c, d, s, HOP, EPS, "high", False)


def chain(fn):
    @jax.jit
    def run(c, d):
        def body(eps, _):
            s = jnp.sum(fn(c + eps, d))
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return run


# agreement first (single eval)
sa = np.asarray(jax.jit(padded)(c_sig, d_sig))
sb = np.asarray(jax.jit(raw)(c_sig, d_sig))
print(f"max |padded - raw| = {np.abs(sa - sb).max():.3e}", flush=True)

fns = {"padded": chain(padded), "raw": chain(raw)}
for r in range(3):
    for name, fn in fns.items():
        np.asarray(fn(c_sig, d_sig))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = np.asarray(fn(c_sig, d_sig))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(
            f"{name:7s} {t * 1e3:6.2f} ms/eval -> {AUD / t:8.0f} audio-s/s "
            f"(out={out[0]:.4f})",
            flush=True,
        )
