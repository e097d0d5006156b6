"""Component-level timing on the real chip using the scan+fetch protocol."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()

B, T = 64, 256000
K = 16
rng = np.random.default_rng(0)
x_np = rng.standard_normal((B, T)).astype(np.float32) * 0.1
x = jnp.asarray(x_np)
y = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)

from fast_speech_enhancement_metrics_tpu.ops.stft import frame, stft, spectrogram, hann_window

def timed(name, fn):
    @jax.jit
    def run_k(x, y, scales):
        def body(_, s):
            return None, fn(x * s, y)
        _, outs = jax.lax.scan(body, None, scales)
        return outs
    scales = jnp.linspace(1.0, 1.001, K)
    np.asarray(run_k(x, y, scales))  # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_k(x, y, scales))
        best = min(best, time.perf_counter() - t0)
    per_batch_ms = best / K * 1e3
    print(f"{name:35s} {per_batch_ms:8.2f} ms/batch  ({B*16/ (best/K):,.0f} audio-s/s)", flush=True)

# LSD pieces (nfft=512 hop=256 centered)
timed("frame 512/256", lambda x, y: jnp.sum(frame(x, 512, 256), axis=(1, 2)))
w = jnp.asarray(hann_window(512))
timed("frame+window", lambda x, y: jnp.sum(frame(x, 512, 256) * w, axis=(1, 2)))
timed("frame+window+rfft|.|", lambda x, y: jnp.sum(jnp.abs(jnp.fft.rfft(frame(x, 512, 256) * w)), axis=(1, 2)))
timed("LSD full spectrogram p=1", lambda x, y: jnp.sum(spectrogram(x, 512, 256, center=True, power=1.0), axis=(1, 2)))

# DFT-matmul alternative
kk = np.arange(512)
f = np.arange(257)
dft_cos = jnp.asarray(np.cos(-2*np.pi*np.outer(kk, f)/512).astype(np.float32))
dft_sin = jnp.asarray(np.sin(-2*np.pi*np.outer(kk, f)/512).astype(np.float32))
def dft_mag(x, y, prec):
    fr = frame(x, 512, 256) * w
    re = jnp.einsum("bfk,kn->bfn", fr, dft_cos, precision=prec)
    im = jnp.einsum("bfk,kn->bfn", fr, dft_sin, precision=prec)
    return jnp.sum(jnp.sqrt(re*re + im*im), axis=(1, 2))
timed("DFT-matmul mag (highest)", functools.partial(dft_mag, prec="highest"))
timed("DFT-matmul mag (default)", functools.partial(dft_mag, prec="default"))

# SDR pieces
import math
n_fft = 2 ** math.ceil(math.log2(2 * T - 1))
timed(f"SDR rfft {n_fft}", lambda x, y: jnp.sum(jnp.abs(jnp.fft.rfft(jnp.stack([x, y]), n=n_fft, axis=-1)), axis=(1, 2)))
n_fft2 = 2 ** math.ceil(math.log2(T + 512))
timed(f"SDR rfft {n_fft2}", lambda x, y: jnp.sum(jnp.abs(jnp.fft.rfft(jnp.stack([x, y]), n=n_fft2, axis=-1)), axis=(1, 2)))

from fast_speech_enhancement_metrics_tpu.ops.toeplitz import symmetric_toeplitz_solve
r0_np = np.zeros((B, 512), np.float32); r0_np[:, 0] = 1.0
r0c = jnp.asarray(r0_np + 0.001 * rng.standard_normal((B, 512)).astype(np.float32))
bb = jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))
timed("Toeplitz solve 64x512", lambda x, y: jnp.sum(symmetric_toeplitz_solve(r0c + jnp.sum(x[:1,:1])*0, bb), axis=-1))

# conv-based correlation: per-utterance conv via feature groups
def corr_conv(x, y):
    inp = y[None, :, :]                      # (1, B, T)
    ker = x[:, None, ::-1][:, :, -512:]      # (B, 1, 512) reversed tail? placeholder cost model
    out = jax.lax.conv_general_dilated(
        inp, ker, (1,), [(511, 0)], feature_group_count=B,
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.sum(out, axis=(0, 2))
timed("corr conv 512-tap grouped", corr_conv)
