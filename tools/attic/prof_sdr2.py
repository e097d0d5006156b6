"""Decompose SDR v2 cost on chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()
from fast_speech_enhancement_metrics_tpu.ops.dft import correlation_lags

B, T, L, K = 64, 256000, 512, 32
rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
d = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)

def timed(name, fn):
    @jax.jit
    def run_k(c, d, scales):
        def body(_, s):
            return None, fn(c * s, d)
        _, outs = jax.lax.scan(body, None, scales)
        return outs
    scales = jnp.linspace(1.0, 1.001, K)
    np.asarray(run_k(c, d, scales))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_k(c, d, scales))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best / K * 1e3:8.2f} ms/batch", flush=True)

idx = np.abs(np.arange(L)[None] - np.arange(L)[:, None])

def corr_only(c, d):
    r0, b = correlation_lags(c, (c, d), L, precision="highest")
    return jnp.sum(r0, -1) + jnp.sum(b, -1)

def corr_gather(c, d):
    r0, b = correlation_lags(c, (c, d), L, precision="highest")
    tm = r0[..., idx]
    return jnp.sum(tm, (-1, -2)) + jnp.sum(b, -1)

def corr_slices(c, d):
    r0, b = correlation_lags(c, (c, d), L, precision="highest")
    rr = jnp.concatenate([r0[..., ::-1], r0[..., 1:]], axis=-1)  # (B, 1023)
    rows = [rr[..., L - 1 - i : 2 * L - 1 - i] for i in range(L)]
    tm = jnp.stack(rows, axis=-2)
    return jnp.sum(tm, (-1, -2)) + jnp.sum(b, -1)

def full_chol(c, d):
    r0, b = correlation_lags(c, (c, d), L, precision="highest")
    tm = r0[..., idx]
    ch = jnp.linalg.cholesky(tm)
    y = jax.scipy.linalg.solve_triangular(ch, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(jnp.swapaxes(ch, -1, -2), y, lower=False)[..., 0]
    return jnp.sum(b * x, -1)

timed("corr only", corr_only)
timed("corr + gather toeplitz", corr_gather)
timed("corr + slice-stack toeplitz", corr_slices)
timed("full (gather + chol + solves)", full_chol)
