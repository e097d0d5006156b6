"""Host-chunk sweep for SpeechBERTScore's benchmarked config.

At host_chunk=16 the 128-row doubled batch takes 8 dispatches whose ~24 ms
relay round-trips are ~half the call; larger chunks amortize them. Times the
full metric call (batch 64 x 16 s) with forced host fetch.

Run: python tools/prof_sbs_chunks.py [chunk ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

import jax

from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    init_params,
)

BATCH, DUR = 64, 16
chunks = [int(a) for a in sys.argv[1:]] or [16, 64, 128]

rng = np.random.default_rng(0)
clean = rng.standard_normal((BATCH, DUR * 16000)).astype(np.float32)
den = (clean + 0.3 * rng.standard_normal(clean.shape)).astype(np.float32)

params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)

for chunk in chunks:
    m = SpeechBERTScore(params=params, host_chunk=chunk, act_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    out = m(clean, den)  # __call__ fetches scores to host
    print(f"chunk={chunk:4d} first call (compile) {time.perf_counter()-t0:7.1f} s",
          flush=True)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = m(clean, den)
    dt = (time.perf_counter() - t0) / reps
    aud = BATCH * DUR
    print(f"chunk={chunk:4d} per-call {dt*1e3:8.1f} ms -> "
          f"{aud/dt:8.0f} audio-s/s  (sample score {out[0]})", flush=True)
