"""SDR correlation A/B on the real chip: XLA overlap-save vs fused Pallas.

Times the full SDR metric through the scanned device-throughput protocol
(the benchmarked configuration) with each correlation implementation, the
correlation stage alone, and checks score agreement between the two paths.

Run: python tools/prof_sdr_fused_corr.py [batch] [dur] [chunk_block...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    SCAN_K,
    _scanned,
    configure_cache,
)

configure_cache()

from fast_speech_enhancement_metrics_tpu import SDR
from fast_speech_enhancement_metrics_tpu.ops.dft import correlation_lags
from fast_speech_enhancement_metrics_tpu.ops.sdr_corr_fused import (
    correlation_lags_fused,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
BLOCKS = [int(a) for a in sys.argv[3:]] or [128]
aud = BATCH * DUR

rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
d = jnp.asarray(np.asarray(c) + 0.3 * rng.standard_normal(c.shape), dtype=jnp.float32)


def time_calls(fn, reps=4):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


# correlation stage alone, 8-deep chain to amortize the RPC
def corr_chain(fn, n=8):
    @jax.jit
    def run(c, d):
        s = jnp.float32(1.0)
        outs = None
        for _ in range(n):
            r0, b = fn(c * s, d)
            s = 1.0 + jnp.abs(r0[0, 0]) * 1e-12
            outs = (r0[:, :8], b[:, :8])
        return outs

    return lambda: np.asarray(run(c, d)[0])


xla_fn = lambda cc, dd: correlation_lags(cc, (cc, dd), 512, precision="high")
t = time_calls(corr_chain(xla_fn))
print(f"corr x8 [xla high     ] {t*1e3:8.2f} ms -> {t/8*1e3:6.2f} ms/eval", flush=True)
for cb in BLOCKS:
    fused_fn = lambda cc, dd: correlation_lags_fused(cc, dd, 512, chunk_block=cb)
    t = time_calls(corr_chain(fused_fn))
    print(f"corr x8 [fused cb={cb:4d}] {t*1e3:8.2f} ms -> {t/8*1e3:6.2f} ms/eval",
          flush=True)

# score agreement between the two full-metric paths
m_xla = SDR(corr_impl="xla")
m_fused = SDR(corr_impl="fused")
s_xla = np.asarray(m_xla._compute_resampled(c, d)["SDR"])
s_fused = np.asarray(m_fused._compute_resampled(c, d)["SDR"])
print(f"score agreement xla-vs-fused: max abs dev {np.abs(s_xla - s_fused).max():.2e} dB",
      flush=True)

for name, m in (("xla", m_xla), ("fused", m_fused)):
    runner = _scanned(m._compute_resampled, intrusive=True)
    outs = np.asarray(runner(c, d, 0)["SDR"])
    t = time_calls(lambda: np.asarray(runner(c, d, 1)["SDR"]))
    print(f"SDR scanned [{name:6s}] {t*1e3:8.1f} ms/dispatch -> "
          f"{aud*SCAN_K/t:8.0f} audio-s/s (score[0]={outs[0,0]:.3f})", flush=True)
