"""Leaf-cost measurements for a blocked Cholesky design."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()

B, K = 64, 64
rng = np.random.default_rng(0)

def timed(name, fn, *args):
    @jax.jit
    def run_k(scales, *a):
        def body(_, s):
            return None, fn(s, *a)
        _, outs = jax.lax.scan(body, None, scales)
        return outs
    scales = jnp.linspace(1.0, 1.001, K)
    np.asarray(run_k(scales, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_k(scales, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best / K * 1e3:8.2f} ms/batch", flush=True)

def spd(n):
    a = rng.standard_normal((B, n, n)).astype(np.float32) * 0.05
    m = a @ np.swapaxes(a, 1, 2) + np.eye(n, dtype=np.float32)[None] * 2.0
    return jnp.asarray(m)

for n in (64, 128, 256):
    m = spd(n)
    timed(f"cholesky {B}x{n}x{n}", lambda s, m: jnp.sum(jnp.linalg.cholesky(m * s), axis=(1, 2)), m)

# triangular solve with a WIDE right-hand side (panel): B x n x n \ B x n x w
for n, w in ((128, 384), (256, 256), (64, 448)):
    m = spd(n)
    l = jnp.linalg.cholesky(m)
    rhs = jnp.asarray(rng.standard_normal((B, n, w)).astype(np.float32))
    timed(
        f"tri_solve {B}x{n}x{n} rhs {w}",
        lambda s, l, rhs: jnp.sum(
            jax.scipy.linalg.solve_triangular(l, rhs * s, lower=True), axis=(1, 2)
        ),
        l, rhs,
    )

# vector triangular solve at 512 (the current epilogue cost)
m = spd(512)
l = jnp.linalg.cholesky(m)
rhs = jnp.asarray(rng.standard_normal((B, 512, 1)).astype(np.float32))
timed("tri_solve 64x512x512 rhs 1", lambda s, l, rhs: jnp.sum(
    jax.scipy.linalg.solve_triangular(l, rhs * s, lower=True), axis=(1, 2)), l, rhs)

# matmul update cost 64 x 384x128 @ 128x384
a = jnp.asarray(rng.standard_normal((B, 384, 128)).astype(np.float32))
timed("syrk 64x(384x128)@(128x384)", lambda s, a: jnp.sum(
    jnp.einsum("bik,bjk->bij", a * s, a, precision="highest"), axis=(1, 2)), a)

# triangular INVERSE at small n (for matmul-only solves): inv(L) 64x64 leaves
m64 = spd(64)
l64 = jnp.linalg.cholesky(m64)
eye = jnp.eye(64, dtype=jnp.float32)[None].repeat(B, 0)
timed("tri inv via solve 64x64x64", lambda s, l, e: jnp.sum(
    jax.scipy.linalg.solve_triangular(l * s, e, lower=True), axis=(1, 2)), l64, eye)

# empty-body baseline: pure harness + RPC floor
z = jnp.asarray(np.zeros((B, 8), np.float32))
timed("baseline (trivial body)", lambda s, z: jnp.sum(z * s, axis=1), z)
