"""Diagnose whether the scanned bench protocol lets XLA hoist the heavy
front-end out of the scan body (multiplicative per-iteration scale commutes
through dot products via the algebraic simplifier, making the matmul
loop-invariant -> LICM).

Three timings of K=32 "evaluations" of a DFT-matmul-like workload:
  A. scale protocol  (current runner: input * s_k per iteration)
  B. carry protocol  (input + carry, carry derived from previous scores)
  C. single eval     (one evaluation, for the honest per-eval baseline)

If A >> B in implied throughput, the hoist is real and the runner must
switch to the carry protocol.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")
import jax, jax.numpy as jnp, numpy as np
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()

B, T = 64, 256_000
NFFT, HOP = 512, 256
K = 32

x = jax.device_put(np.random.default_rng(0).standard_normal((B, T)).astype(np.float32))
w = jax.device_put(np.random.default_rng(1).standard_normal((NFFT, NFFT + 2)).astype(np.float32))


def evaluate(sig):
    nf = (T - NFFT) // HOP + 1
    idx = (jnp.arange(nf)[:, None] * HOP + jnp.arange(NFFT)[None, :])
    frames = sig[:, idx]                      # (B, nf, NFFT)
    spec = jnp.einsum("bnf,fk->bnk", frames, w, precision="highest")
    return jnp.log(jnp.abs(spec) + 1e-9).mean(axis=(1, 2))  # (B,)


@jax.jit
def scan_scale(x, scales):
    def body(_, s):
        return None, evaluate(x * s)
    _, outs = jax.lax.scan(body, None, scales)
    return outs

@jax.jit
def scan_carry(x):
    def body(c, _):
        scores = evaluate(x + c)
        return jnp.mean(scores) * 1e-12, scores
    _, outs = jax.lax.scan(body, 0.0, jnp.arange(K))
    return outs

@jax.jit
def single(x):
    return evaluate(x)


def timeit(fn, *a, reps=3):
    np.asarray(fn(*a))  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(fn(*a))
    return (time.perf_counter() - t0) / reps, out

scales = jnp.linspace(1.0, 1.001, K)
nf = (T - NFFT) // HOP + 1
flop_per_eval = 2 * B * nf * NFFT * (NFFT + 2)

t_single, _ = timeit(single, x)
print(f"single eval:   {t_single*1e3:8.2f} ms  ({flop_per_eval/t_single/1e12:6.1f} TFLOP/s)")
t_scale, _ = timeit(scan_scale, x, scales)
print(f"scan*scale K32:{t_scale*1e3:8.2f} ms  ({K*flop_per_eval/t_scale/1e12:6.1f} TFLOP/s implied)")
t_carry, _ = timeit(scan_carry, x)
print(f"scan+carry K32:{t_carry*1e3:8.2f} ms  ({K*flop_per_eval/t_carry/1e12:6.1f} TFLOP/s implied)")
print(f"ratio scale/carry per-eval time: {t_scale/t_carry:.3f}")
