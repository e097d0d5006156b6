"""host_chunk sweep for DNSMOS / SpeechBERTScore on the real chip.

The host-chunked execution plans dispatch one jitted graph per chunk; through
this environment's relay each dispatch costs ~28 ms RPC. Larger chunks
amortize RPC at the cost of one bigger compile. Measures batch-64x16s wall
per host_chunk and reports audio-s/s.

Run: python tools/prof_chunks.py [DNSMOS|SBS] [chunks, e.g. 16,32,64]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

import jax.numpy as jnp

from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

WHICH = sys.argv[1] if len(sys.argv) > 1 else "DNSMOS"
CHUNKS = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "16,32,64").split(",")]
BATCH, DUR = 64, 16

clean, noisy, _ = load_audio_data(DUR, BATCH, 16000)


def make(chunk):
    if WHICH == "DNSMOS":
        from fast_speech_enhancement_metrics_tpu import DNSMOS

        return DNSMOS(host_chunk=chunk, conv_dtype=jnp.bfloat16), None
    from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
    from fast_speech_enhancement_metrics_tpu.models.hubert import (
        MHUBERT_147_CONFIG,
        init_params,
    )

    params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)
    return SpeechBERTScore(params=params, host_chunk=chunk), None


for chunk in CHUNKS:
    metric, _ = make(chunk)
    args = (None, noisy) if WHICH == "DNSMOS" else (clean, noisy)
    pc, pn = metric.prepare_inputs(*args)

    t0 = time.perf_counter()
    out = {k: np.asarray(v) for k, v in metric._run_prepared(pc, pn).items()}
    compile_s = time.perf_counter() - t0

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = {k: np.asarray(v) for k, v in metric._run_prepared(pc, pn).items()}
    per_call = (time.perf_counter() - t0) / reps
    print(
        f"{WHICH} host_chunk={chunk:3d}: {per_call*1e3:8.1f} ms/call "
        f"({BATCH*DUR/per_call:8,.0f} audio-s/s)  compile+first {compile_s:.1f}s",
        flush=True,
    )
    del metric
