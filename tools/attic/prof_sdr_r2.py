"""SDR stage ablation on the real chip: correlations vs Levinson solve.

Run: python tools/prof_sdr_r2.py [batch] [dur]
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

from fast_speech_enhancement_metrics_tpu.metrics.sdr import SDR
from fast_speech_enhancement_metrics_tpu.ops.dft import correlation_lags
from fast_speech_enhancement_metrics_tpu.ops.toeplitz import levinson_solve

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
T = DUR * 16000
rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, T)), dtype=jnp.float32)
d = jnp.asarray(c + 0.3 * rng.standard_normal((BATCH, T)), dtype=jnp.float32)


def timed(fn, *args, reps=5):
    jfn = jax.jit(fn)
    np.asarray(jax.tree.leaves(jfn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(jax.tree.leaves(jfn(*args))[0])
    return (time.perf_counter() - t0) / reps


rpc = timed(lambda a: a[:1, :1] + 1.0, c)
print(f"rpc                     {rpc*1e3:8.2f} ms", flush=True)

t = timed(lambda a, b: correlation_lags(a, (a, b), 512, precision="highest")[0][:, ::7], c, d)
print(f"correlations only       {(t-rpc)*1e3:8.2f} ms", flush=True)

r0, b = jax.jit(lambda a, b: correlation_lags(a, (a, b), 512, precision="highest"))(c, d)
r0, b = jnp.asarray(np.asarray(r0)), jnp.asarray(np.asarray(b))
t = timed(lambda r, bb: levinson_solve(r, bb)[:, ::7], r0, b)
print(f"levinson solve only     {(t-rpc)*1e3:8.2f} ms", flush=True)

m = SDR()
t = timed(lambda a, b: m._compute(a, b)["SDR"], c, d)
print(f"full SDR                {(t-rpc)*1e3:8.2f} ms", flush=True)
print(f"audio-s/s at full: {BATCH*DUR/t:,.0f} (ref GPU 104k; 5x target 520k)", flush=True)

# accuracy: default precision ("high" correlations + unrolled Levinson)
# against the float64 oracle on real speech-like fixtures
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data
from tests.oracles.sdr_oracle import sdr_oracle

speech, noisier, _ = load_audio_data(4, 4, 16000)
got = m(speech, noisier)
want = sdr_oracle(np.asarray(speech, np.float64), np.asarray(noisier, np.float64))
dev = np.abs(np.array([r["SDR"] for r in got]) - np.asarray(want).ravel()).max()
print(f"SDR dev vs f64 oracle (default precision): {dev:.3e} (contract 1e-2)", flush=True)
