"""Time Toeplitz-solve variants + block-DFT correlation on the chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()

B, L, K = 64, 512, 8
rng = np.random.default_rng(0)
# realistic-ish SPD Toeplitz rows: decaying autocorrelation + identity load
lags = np.arange(L)
r_np = (0.995 ** lags)[None] * (1.0 + 0.01 * rng.standard_normal((B, L)))
r_np[:, 0] = 1.5
b_np = rng.standard_normal((B, L)).astype(np.float32)
r = jnp.asarray(r_np.astype(np.float32)); b = jnp.asarray(b_np)

idx = np.abs(np.arange(L)[None] - np.arange(L)[:, None])

def timed(name, fn):
    @jax.jit
    def run_k(r, b, scales):
        def body(_, s):
            return None, fn(r * s, b)
        _, outs = jax.lax.scan(body, None, scales)
        return outs
    scales = jnp.linspace(1.0, 1.001, K)
    np.asarray(run_k(r, b, scales))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_k(r, b, scales))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:32s} {best / K * 1e3:8.2f} ms/batch", flush=True)

def chol_solve(r, b):
    T = r[..., idx]
    c = jnp.linalg.cholesky(T)
    y = jax.scipy.linalg.solve_triangular(c, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.swapaxes(c, -1, -2), y, lower=False)[..., 0]
    return jnp.sum(b * x, axis=-1)

def lu_solve(r, b):
    T = r[..., idx]
    x = jnp.linalg.solve(T, b[..., None])[..., 0]
    return jnp.sum(b * x, axis=-1)

def inv_solve(r, b):
    T = r[..., idx]
    x = (jnp.linalg.inv(T) @ b[..., None])[..., 0]
    return jnp.sum(b * x, axis=-1)

def chol_only(r, b):
    T = r[..., idx]
    c = jnp.linalg.cholesky(T)
    return jnp.sum(c, axis=(-1, -2)) + jnp.sum(b[:, :1])

timed("cholesky + 2 tri solves", chol_solve)
timed("lu solve", lu_solve)
timed("inv @ b", inv_solve)
timed("cholesky only", chol_only)

# block-DFT correlation: both signals, 512 lags, T=256000
T_sig = 256000
x_np = rng.standard_normal((B, T_sig)).astype(np.float32) * 0.1
c_sig = jnp.asarray(x_np)
d_sig = jnp.asarray(rng.standard_normal((B, T_sig)).astype(np.float32) * 0.1)

W = 1024
nb = W // 2 + 1
t_ = np.arange(W, dtype=np.float64)[:, None]
f_ = np.arange(nb, dtype=np.float64)[None, :]
ang = -2 * np.pi * t_ * f_ / W
COS = jnp.asarray(np.cos(ang), dtype=jnp.float32)
SIN = jnp.asarray(np.sin(ang), dtype=jnp.float32)

def block_corr(c, d, prec):
    # c windows: frame(c_pad, 1024, 512) via chunk trick; d blocks (K,512) pad
    Kb = T_sig // 512
    cp = jnp.pad(c, ((0, 0), (512, 0)))
    chunks = cp.reshape(B, Kb + 1, 512)
    # window w_k = [chunk_k, chunk_{k+1}]
    def mm(part, M):
        return jnp.einsum("bkh,hn->bkn", part, M, precision=prec)
    re_c = mm(chunks[:, :-1], COS[:512]) + mm(chunks[:, 1:], COS[512:])
    im_c = mm(chunks[:, :-1], SIN[:512]) + mm(chunks[:, 1:], SIN[512:])
    dch = d.reshape(B, Kb, 512)
    re_d = mm(dch, COS[:512]); im_d = mm(dch, SIN[:512])
    # S = conj(C) * D summed over blocks
    S_re = jnp.sum(re_c * re_d + im_c * im_d, axis=1)
    S_im = jnp.sum(re_c * im_d - im_c * re_d, axis=1)
    # inverse DFT at 512 lags only: cost negligible, here summed as proxy
    return jnp.sum(S_re, axis=-1) + jnp.sum(S_im, axis=-1)

def timed2(name, fn):
    @jax.jit
    def run_k(c, d, scales):
        def body(_, s):
            return None, fn(c * s, d)
        _, outs = jax.lax.scan(body, None, scales)
        return outs
    scales = jnp.linspace(1.0, 1.001, K)
    np.asarray(run_k(c_sig, d_sig, scales))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_k(c_sig, d_sig, scales))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:32s} {best / K * 1e3:8.2f} ms/batch", flush=True)

import functools
timed2("block-DFT corr (highest)", functools.partial(block_corr, prec="highest"))
timed2("block-DFT corr (high)", functools.partial(block_corr, prec="high"))
timed2("block-DFT corr (default)", functools.partial(block_corr, prec="default"))
