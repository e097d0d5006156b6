"""LSD stage ablation + precision-accuracy check on the real chip.

Times: projection only, DFT only ("highest" vs "high"), full LSD at both
precisions; then checks "high" agreement vs the float64 oracle (contract:
reference pins rel 1e-5 vs its librosa recipe).

Run: python tools/prof_lsd.py [batch] [dur]
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

from fast_speech_enhancement_metrics_tpu.metrics.lsd import LSD
from fast_speech_enhancement_metrics_tpu.ops.dft import framed_spectrogram

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DUR = int(sys.argv[2]) if len(sys.argv) > 2 else 16
T = DUR * 16000
rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, T)), dtype=jnp.float32)
d = jnp.asarray(c + 0.3 * rng.standard_normal((BATCH, T)), dtype=jnp.float32)
both = jnp.concatenate([c, d], axis=0)


def timed(fn, *args, reps=5):
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(jfn(*args))
    return (time.perf_counter() - t0) / reps


rpc = timed(lambda a: a[:1, :1] + 1.0, c)
print(f"rpc                       {rpc*1e3:8.2f} ms", flush=True)

for prec in ("highest", "high"):
    t = timed(
        lambda s, p=prec: framed_spectrogram(
            s, 512, 256, center=True, power=1.0, precision=p
        )[:, ::13, ::13],
        both,
    )
    print(f"spectrogram ({prec:7s})    {(t-rpc)*1e3:8.2f} ms", flush=True)

m = LSD()
t = timed(lambda a, b: m._compute(a, b)["LSD"], c, d)
print(f"full LSD (highest)        {(t-rpc)*1e3:8.2f} ms -> "
      f"{BATCH*DUR/(t-rpc):,.0f} audio-s/s", flush=True)

# accuracy of "high" on speech-like fixtures vs the float64 oracle
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data
from tests.oracles.lsd_oracle import lsd_oracle

speech, noisier, _ = load_audio_data(4, 4, 16000)


class LSDHigh(LSD):
    def _compute(self, clean, denoised):
        assert clean is not None
        batch = clean.shape[0]
        scale = jnp.sum(clean * denoised, axis=1, keepdims=True) / (
            jnp.sum(denoised * denoised, axis=1, keepdims=True) + self.eps
        )
        denoised = denoised * scale
        speech = jnp.concatenate([clean, denoised], axis=0)
        mag = framed_spectrogram(
            speech, self.nfft, self.hop, center=True, power=1.0, precision="high"
        )
        cc, dd = mag[:batch], mag[batch:]
        log_ratio = jnp.log(jnp.square(cc) / jnp.square(dd + self.eps) + self.eps)
        return {"LSD": jnp.mean(jnp.sqrt(jnp.mean(log_ratio**2, axis=2)), axis=1)}


want = np.asarray(lsd_oracle(np.asarray(speech, np.float64), np.asarray(noisier, np.float64))).ravel()
for name, metric in (("highest", LSD()), ("high", LSDHigh())):
    got = np.array([r["LSD"] for r in metric(speech, noisier)])
    rel = (np.abs(got - want) / np.abs(want)).max()
    print(f"LSD {name:7s} rel dev vs f64 oracle: {rel:.3e}", flush=True)
