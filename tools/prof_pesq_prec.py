"""PESQ precision A/B on the chip: "highest" (bf16x6) vs "high" (bf16x3).

Chained protocol, interleaved rounds; also prints the on-chip deviation of
each mode vs the float64 oracle on a real SNR-mixed fixture.

Run: python tools/prof_pesq_prec.py
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

from fast_speech_enhancement_metrics_tpu import PESQ
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data
from tests.oracles.pesq_oracle import pesq_oracle

BATCH, DUR = 64, 16
AUD = BATCH * DUR
CHAIN_K = 16

clean, noisy, _ = load_audio_data(DUR, BATCH, 16000)
oracle = np.asarray(pesq_oracle(clean[:8], noisy[:8]))

metrics = {p: PESQ(precision=p) for p in ("highest", "high")}
for name, m in metrics.items():
    got = np.array([r["PESQ"] for r in m(clean[:8], noisy[:8])])
    print(f"{name:8s} oracle dev {np.abs(got - oracle).max():.2e}", flush=True)


def chain(m):
    compute = m._compute_resampled

    @jax.jit
    def run(c, d):
        def body(eps, _):
            s = jnp.sum(compute(c + eps, d)["PESQ"])
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    return run


cj = jnp.asarray(clean, dtype=jnp.float32)
dj = jnp.asarray(noisy, dtype=jnp.float32)
fns = {name: chain(m) for name, m in metrics.items()}
for r in range(3):
    for name, fn in fns.items():
        np.asarray(fn(cj, dj))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = np.asarray(fn(cj, dj))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(
            f"round {r} {name:8s} {t * 1e3:6.2f} ms/eval -> {AUD / t:7.0f} audio-s/s",
            flush=True,
        )
