import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")
import jax, jax.numpy as jnp, numpy as np
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()

N = (8192, 8192)  # 67M elements
x = jnp.asarray(np.random.default_rng(0).standard_normal(N) * 5, jnp.float32)
CHAIN = 32

def mk(fn):
    @jax.jit
    def run(x, seed):
        s = 1.0 + seed * 1e-9
        out = x * s
        for _ in range(CHAIN):
            out = fn(out)
            out = out * (1.0 / (1.0 + jnp.abs(out[0, 0]) * 1e-12))  # anti-hoist
        return out[0, :2]
    return lambda i: np.asarray(run(x, jnp.float32(i)))

def bit_exp2(v):
    # fast 2^v via exponent-field bitcast + cubic mantissa polish
    v = jnp.clip(v, -30.0, 30.0)
    fl = jnp.floor(v)
    frac = v - fl
    # 2^frac ~ cubic minimax on [0,1)
    p = 1.0 + frac * (0.6951786 + frac * (0.2289419 + frac * 0.0790209))
    scale = jax.lax.bitcast_convert_type(((fl.astype(jnp.int32) + 127) << 23), jnp.float32)
    return p * scale

VAR = {
    "mul2 (baseline)": lambda v: v * 1.0000001,
    "exp2": lambda v: jnp.exp2(jnp.clip(v, -30, 30)),
    "exp": lambda v: jnp.exp(jnp.clip(v, -20, 20)),
    "tanh": jnp.tanh,
    "bit_exp2": bit_exp2,
}
calls = {k: mk(v) for k, v in VAR.items()}
for k, c in calls.items(): c(0)
res = {k: [] for k in calls}
for r in range(3):
    for k, c in calls.items():
        t0 = time.perf_counter(); c(r+1); res[k].append((time.perf_counter()-t0)/CHAIN*1e3)
for k, ts in res.items():
    med = sorted(ts)[1]
    print(f"{k:16s} {med:7.3f} ms/pass ({67.1/med:6.1f} G elem/ms... {67.1e6/med/1e6:5.1f} G/s)")
