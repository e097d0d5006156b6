"""MXU quantization probe: is a small-N matmul fixed by transposing?

The MXU tiles M in sublanes (8-quantized) and K/N in lanes (128-quantized),
so (M_huge, K) x (K, 64) should waste half its lanes while the transposed
(64, K) x (K, N_huge) form runs full-rate. If confirmed, a CHW-layout conv
formulation (weights-as-M) lifts DNSMOS's channel-starved trunk (N = 64/32
caps it at 50/25%) without padded FLOPs.

Shapes mirror DNSMOS conv1: M = 64*1599*161/~16 per call, K = 1152, co = 64.
Chain 64 matmuls per dispatch; bf16 inputs, fp32 accumulate.
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

CHAIN = 64
M = 64 * 1024  # positions
rng = np.random.default_rng(0)

cases = {
    "N=64  (K=1152)": ((M, 1152), (1152, 64)),
    "N=64T (K=1152)": ((64, 1152), (1152, M)),
    "N=32  (K=576)": ((M, 576), (576, 32)),
    "N=32T (K=576)": ((32, 576), (576, M)),
    "N=128 (K=1152)": ((M, 1152), (1152, 128)),
    "N=512 (K=1536)": ((M // 4, 1536), (1536, 512)),
}


def make(a_shape, b_shape):
    a = jnp.asarray(rng.standard_normal(a_shape), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(b_shape), jnp.bfloat16)

    @jax.jit
    def run(a, b, seed):
        s = (1.0 + seed * 1e-6).astype(jnp.bfloat16)
        out = None
        aa = a * s
        for _ in range(CHAIN):
            out = jnp.dot(aa, b, preferred_element_type=jnp.float32)
            aa = a * (1.0 + out[0, 0] * 1e-12).astype(jnp.bfloat16)
        return out[0, :4]

    flops = 2 * a_shape[0] * a_shape[1] * b_shape[1] * CHAIN
    return (lambda i: np.asarray(run(a, b, jnp.bfloat16(i)))), flops


calls = {k: make(*v) for k, v in cases.items()}
for name, (call, _) in calls.items():
    call(0)

results = {k: [] for k in calls}
for r in range(3):
    for name, (call, flops) in calls.items():
        t0 = time.perf_counter()
        call(r + 1)
        dt = time.perf_counter() - t0
        results[name].append(flops / dt / 1e12)
        print(f"round {r} {name:16s} {flops/dt/1e12:7.1f} TFLOP/s", flush=True)

print()
for name, ts in results.items():
    print(f"MEDIAN {name:16s} {sorted(ts)[len(ts)//2]:7.1f} TFLOP/s", flush=True)
