"""fp32 Levinson-Durbin accuracy for the SDR Toeplitz solve vs f64 direct."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data
from scipy.linalg import solve_toeplitz

B, T, L = 16, 256000, 512
clean, noisy, _ = load_audio_data(16, B, 16000)
c = np.asarray(clean, np.float64); d = np.asarray(noisy, np.float64)
c /= np.maximum(np.linalg.norm(c, axis=-1, keepdims=True), 1e-6)
d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
n_fft = 1 << int(np.ceil(np.log2(2 * T - 1)))
C = np.fft.rfft(c, n_fft); D = np.fft.rfft(d, n_fft)
r = np.fft.irfft(np.abs(C) ** 2, n_fft)[:, :L]
b = np.fft.irfft(np.conj(C) * D, n_fft)[:, :L]

def sdr_of(coh):
    return 10 * np.log10(np.maximum(coh / np.maximum(1 - coh, 1e-8), 1e-8))

truth = np.array([sdr_of(b[i] @ solve_toeplitz(r[i], b[i])) for i in range(B)])

def levinson(r, b, dtype):
    """Batched Levinson: solve T(r) x = b. r,b: (B, L)."""
    r = r.astype(dtype); b = b.astype(dtype)
    B_, L_ = r.shape
    x = np.zeros((B_, L_), dtype)
    f = np.zeros((B_, L_), dtype)  # forward vector (order n)
    x[:, 0] = b[:, 0] / r[:, 0]
    f[:, 0] = 1.0 / r[:, 0]
    eps = np.finfo(dtype).tiny
    for n in range(1, L_):
        # error of forward vector extended by zero
        ef = np.sum(r[:, 1 : n + 1][:, ::-1] * f[:, :n], axis=1)
        denom = 1.0 - ef * ef
        denom = np.where(np.abs(denom) < eps, eps, denom)
        # new forward vector of order n+1 (symmetric Toeplitz)
        fn = np.zeros((B_, n + 1), dtype)
        fn[:, :n] = f[:, :n]
        fn[:, 1:] -= (ef / denom)[:, None] * f[:, :n][:, ::-1]
        fn[:, :n] /= denom[:, None] * np.ones((B_, 1), dtype)
        # fix: standard update  f_new = (f_ext - ef * rev(f_ext)) / (1 - ef^2)
        f_ext = np.zeros((B_, n + 1), dtype)
        f_ext[:, :n] = f[:, :n]
        fn = (f_ext - ef[:, None] * f_ext[:, ::-1]) / denom[:, None]
        # solution update
        ex = np.sum(r[:, 1 : n + 1][:, ::-1] * x[:, :n], axis=1)
        x[:, : n + 1] = np.concatenate([x[:, :n], np.zeros((B_, 1), dtype)], 1) + (
            (b[:, n] - ex)[:, None] * fn[:, ::-1]
        )
        f[:, : n + 1] = fn
    return x

for dt in (np.float64, np.float32):
    x = levinson(r, b, dt)
    coh = np.sum(b.astype(dt) * x, axis=1)
    got = sdr_of(coh)
    print(dt.__name__, "max|dSDR| =", np.abs(got - truth).max(), "dB")
