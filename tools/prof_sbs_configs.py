"""SpeechBERTScore execution-plan comparison on the real chip.

Configs: host-chunked (Python loop, per-call RPC each chunk) at 16/64 rows,
and the fused device graph (optionally lax.map-chunked) through the scanned
device-throughput protocol. Run AFTER the compile queue is calm; graphs cache
persistently, so reruns are cheap.

Run: python tools/prof_sbs_configs.py [config ...]
     configs: host16 host64 fused fused_map32 (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    SCAN_K,
    _make_scanned_runner,
    configure_cache,
)

configure_cache()

from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    init_params,
)

BATCH, DUR = 64, 16
aud = BATCH * DUR

rng = np.random.default_rng(0)
clean = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
den = jnp.asarray(
    np.asarray(clean) + 0.3 * rng.standard_normal(clean.shape), dtype=jnp.float32
)
params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)

CONFIGS = {
    "host16": dict(host_chunk=16),
    "host64": dict(host_chunk=64),
    "fused": dict(),
    "fused_map32": dict(batch_chunk=32),
}

names = sys.argv[1:] or list(CONFIGS)
for name in names:
    kw = CONFIGS[name]
    m = SpeechBERTScore(params=params, act_dtype=jnp.bfloat16, **kw)

    def call():
        return {k: np.asarray(v) for k, v in m._run_prepared(clean, den).items()}

    t0 = time.perf_counter()
    out = call()
    print(f"{name:12s} compile+first {time.perf_counter()-t0:7.1f} s", flush=True)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = call()
    t = (time.perf_counter() - t0) / reps
    print(f"{name:12s} per-call {t*1e3:8.1f} ms -> {aud/t:7.0f} audio-s/s "
          f"(score[0]={out['SpeechBERTScore'][0]:.5f})", flush=True)

    runner = _make_scanned_runner(m)
    if runner is not None:
        t0 = time.perf_counter()
        outs = {k: np.asarray(v) for k, v in runner(clean, den, 0).items()}
        print(f"{name:12s} scan compile+first {time.perf_counter()-t0:7.1f} s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(2):
            outs = {k: np.asarray(v) for k, v in runner(clean, den, 1 + i).items()}
        t = (time.perf_counter() - t0) / 2
        print(f"{name:12s} scanned {t*1e3:8.1f} ms/dispatch -> "
              f"{aud*SCAN_K/t:7.0f} audio-s/s", flush=True)
