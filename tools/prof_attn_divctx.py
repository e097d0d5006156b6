"""Attention-stage A/B: normalize the context instead of the weights.

Variants at the bench shape (128, 12, 799, 64), chain 32, interleaved:
  exact        — einsum + jax.nn.softmax (weights normalized, then AV)
  exp2         — current default: exp2 weights normalized, then AV
  exp2_divctx  — exp2 UNNORMALIZED weights -> AV -> divide (T, 64) context
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")
import jax, jax.numpy as jnp, numpy as np
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()

B, H, T, D = 128, 12, 799, 64
CHAIN = 32
S = D**-0.5
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)

def exact(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.bfloat16(S), k)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)

def exp2(q, k, v):
    s2 = jnp.bfloat16(S * 1.4426950408889634)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * s2, k)
    pw = jnp.exp2(jnp.clip(logits.astype(jnp.float32), -100.0, 120.0))
    w = (pw / jnp.sum(pw, axis=-1, keepdims=True)).astype(logits.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)

def exp2_divctx(q, k, v):
    s2 = jnp.bfloat16(S * 1.4426950408889634)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * s2, k)
    pw = jnp.exp2(jnp.clip(logits.astype(jnp.float32), -100.0, 120.0))
    l = jnp.sum(pw, axis=-1, keepdims=True)  # (B,H,T,1) fp32
    ctx = jnp.einsum("bhqk,bhkd->bhqd", pw.astype(logits.dtype), v,
                     preferred_element_type=jnp.float32)
    return (ctx / l).astype(logits.dtype)

VARIANTS = {"exact": exact, "exp2": exp2, "exp2_divctx": exp2_divctx}
oracle = None
for name, fn in VARIANTS.items():
    out = np.asarray(fn(q[:4], k[:4], v[:4]).astype(jnp.float32))
    if oracle is None: oracle = out
    print(f"# {name}: dev vs exact {np.abs(out-oracle).max():.2e}", flush=True)

def chain(fn):
    @jax.jit
    def run(q, k, v, seed):
        s = (1.0 + seed*1e-6).astype(jnp.bfloat16)
        out = v
        for _ in range(CHAIN):
            out = fn(q, k, out * s)
            s = (1.0 + jnp.abs(out[0,0,0,0].astype(jnp.float32))*1e-6).astype(jnp.bfloat16)
        return out[0,0,0]
    return lambda i: np.asarray(run(q, k, v, jnp.bfloat16(i)))

calls = {n: chain(f) for n, f in VARIANTS.items()}
for n, c in calls.items():
    t0=time.perf_counter(); c(0); print(f"# compiled {n} {time.perf_counter()-t0:.1f}s", flush=True)
res = {n: [] for n in calls}
for r in range(4):
    for n, c in calls.items():
        t0=time.perf_counter(); c(r+1); res[n].append((time.perf_counter()-t0)/CHAIN*1e3)
for n, ts in res.items():
    print(f"MEDIAN {n:12s} {sorted(ts)[len(ts)//2]:7.3f} ms/layer", flush=True)
