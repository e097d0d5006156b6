"""Measure the einsum-vs-flash attention crossover on long audio.

The ``attention_impl="auto"`` threshold in metrics/speechbertscore.py was an
estimate (>= 2000 frames); this measures the real encoder throughput with
each impl across utterance lengths and prints the crossover.

Run: python tools/prof_flash_crossover.py [batch] [durations_s ...]
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

from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    hubert_hidden_state,
    init_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
DURS = [int(a) for a in sys.argv[2:]] or [16, 40, 80, 160]

cfg = MHUBERT_147_CONFIG
params = init_params(jax.random.key(0), cfg)
rng = np.random.default_rng(0)


def encoder(impl):
    @jax.jit
    def fn(a):
        return hubert_hidden_state(
            params, a, cfg, output_layer=8, precision="default",
            attention_impl=impl, act_dtype=jnp.bfloat16,
        )[:, ::97, ::97]

    return fn


for dur in DURS:
    t_samples = dur * 16000
    frames = (t_samples - 400) // 320 + 1
    audio = jnp.asarray(
        rng.standard_normal((BATCH, t_samples)), dtype=jnp.float32
    )
    row = [f"dur={dur:4d}s frames={frames:5d}"]
    for impl in ("einsum", "flash"):
        try:
            fn = encoder(impl)
            np.asarray(fn(audio))  # compile + warm
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                np.asarray(fn(audio))
            t = (time.perf_counter() - t0) / reps
            row.append(f"{impl}={t*1e3:8.1f} ms")
        except Exception as e:  # OOM etc.
            row.append(f"{impl}=FAIL({type(e).__name__})")
    print("  ".join(row), flush=True)
