"""DNSMOS fully-fused plan vs host-chunked plan on the real chip.

host_chunk pays one ~25 ms relay round-trip per chunk; the fused _compute
(window_plan="shared_exact", host_chunk=None) is a single dispatch AND
qualifies for the scanned device-throughput protocol. Times both, plus the
scanned fused variant.

Run: python tools/prof_dnsmos_fused.py [batch] [dur]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    SCAN_K,
    _scanned,
    configure_cache,
)

configure_cache()

from fast_speech_enhancement_metrics_tpu import DNSMOS

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
aud = BATCH * DUR

rng = np.random.default_rng(0)
den = jnp.asarray(
    rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32
)


def time_calls(fn, reps=4):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


m_host = DNSMOS(host_chunk=16, conv_dtype=jnp.bfloat16)
t0 = time.perf_counter()
out = {k: np.asarray(v) for k, v in m_host._run_prepared(None, den).items()}
print(f"host_chunk=16 compile {time.perf_counter()-t0:6.1f} s", flush=True)
t = time_calls(lambda: {k: np.asarray(v) for k, v in m_host._run_prepared(None, den).items()})
print(f"host_chunk=16 per-call {t*1e3:8.1f} ms -> {aud/t:8.0f} audio-s/s "
      f"(OVRL[0]={out['OVRL'][0]:.4f})", flush=True)

m_fused = DNSMOS(conv_dtype=jnp.bfloat16)
t0 = time.perf_counter()
out = {k: np.asarray(v) for k, v in m_fused._run_prepared(None, den).items()}
print(f"fused compile {time.perf_counter()-t0:6.1f} s", flush=True)
t = time_calls(lambda: {k: np.asarray(v) for k, v in m_fused._run_prepared(None, den).items()})
print(f"fused per-call {t*1e3:8.1f} ms -> {aud/t:8.0f} audio-s/s "
      f"(OVRL[0]={out['OVRL'][0]:.4f})", flush=True)

runner = _scanned(m_fused._compute_resampled, intrusive=False)
t0 = time.perf_counter()
outs = {k: np.asarray(v) for k, v in runner(None, den, 0).items()}
print(f"scanned fused compile {time.perf_counter()-t0:6.1f} s", flush=True)
t = time_calls(lambda: {k: np.asarray(v) for k, v in runner(None, den, 1).items()})
print(f"scanned fused per-dispatch {t*1e3:8.1f} ms -> "
      f"{aud*SCAN_K/t:8.0f} audio-s/s "
      f"(OVRL[0,0]={outs['OVRL'][0][0]:.4f})", flush=True)
