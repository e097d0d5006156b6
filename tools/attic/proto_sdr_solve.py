"""Offline prototype: how many PCG iterations does the SDR Toeplitz solve
need on realistic fixtures, with a Strang circulant preconditioner, to match
the float64 direct solve within the SDR tolerance (abs 1e-2 dB)?"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data
from scipy.linalg import solve_toeplitz

B, T = 16, 256000
clean, noisy, _ = load_audio_data(16, B, 16000)
c = np.asarray(clean, np.float64)
d = np.asarray(noisy, np.float64)
c /= np.maximum(np.linalg.norm(c, axis=-1, keepdims=True), 1e-6)
d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

L = 512
n_fft = 1 << int(np.ceil(np.log2(2 * T - 1)))
C = np.fft.rfft(c, n_fft)
D = np.fft.rfft(d, n_fft)
r = np.fft.irfft(np.abs(C) ** 2, n_fft)[:, :L]
b = np.fft.irfft(np.conj(C) * D, n_fft)[:, :L]

# float64 ground truth coherence -> SDR
sdr_true = np.empty(B)
for i in range(B):
    x = solve_toeplitz(r[i], b[i])
    coh = b[i] @ x
    sdr_true[i] = 10 * np.log10(max(coh / max(1 - coh, 1e-8), 1e-8))

# PCG in float32 with Strang circulant preconditioner
def pcg(r32, b32, iters):
    B, L = r32.shape
    # Toeplitz matvec via 2L-point circulant embedding
    n2 = 2 * L
    first_col = np.concatenate([r32, np.zeros((B, 1), np.float32),
                                r32[:, :0:-1]], axis=1)  # (B, 2L)
    FC = np.fft.rfft(first_col, n2)
    def matvec(p):
        P = np.fft.rfft(p, n2)
        return np.fft.irfft(FC * P, n2)[:, :L].astype(np.float32)
    # Strang preconditioner: circulant with c_k = r_k + r_{L-k}
    s = r32.copy()
    s[:, 1:] += r32[:, :0:-1]
    FS = np.fft.rfft(s, L).real  # eigenvalues of symmetric circulant
    FS = np.maximum(FS, 1e-8 * FS.max(axis=1, keepdims=True))
    def prec(v):
        return np.fft.irfft(np.fft.rfft(v, L) / FS, L).astype(np.float32)
    x = np.zeros_like(b32)
    res = b32 - matvec(x)
    z = prec(res)
    p = z.copy()
    rz = np.sum(res * z, axis=1)
    for _ in range(iters):
        Ap = matvec(p)
        alpha = rz / np.maximum(np.sum(p * Ap, axis=1), 1e-30)
        x += alpha[:, None] * p
        res -= alpha[:, None] * Ap
        z = prec(res)
        rz_new = np.sum(res * z, axis=1)
        beta = rz_new / np.maximum(rz, 1e-30)
        p = z + beta[:, None] * p
        rz = rz_new
    return x

r32, b32 = r.astype(np.float32), b.astype(np.float32)
for iters in (5, 10, 15, 20, 30, 50):
    x = pcg(r32, b32, iters)
    coh = np.sum(b32 * x, axis=1)
    sdr = 10 * np.log10(np.maximum(coh / np.maximum(1 - coh, 1e-8), 1e-8))
    print(f"iters={iters:3d} max|dSDR|={np.abs(sdr - sdr_true).max():.2e} dB")

# how bad is a plain fp32 Cholesky (the current path) for scale?
from scipy.linalg import cho_factor, cho_solve
idx = np.abs(np.arange(L)[None] - np.arange(L)[:, None])
err = []
for i in range(B):
    Tm = r32[i][idx]
    try:
        xc = cho_solve(cho_factor(Tm.astype(np.float32)), b32[i])
    except Exception:
        xc = np.linalg.solve(Tm, b32[i])
    coh = float(b32[i] @ xc)
    err.append(10 * np.log10(max(coh / max(1 - coh, 1e-8), 1e-8)) - sdr_true[i])
print("fp32 Cholesky  max|dSDR| =", np.abs(err).max(), "dB")
