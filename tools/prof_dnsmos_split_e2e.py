"""HISTORICAL full-graph A/B of the DNSMOS time->batch split trunk.

Verdict: exactly neutral end-to-end (10.60k both arms) despite the isolated
trunk winning 1.65x — the split was removed from dnsmos_net.py; this probe
is kept as the record and no longer runs against HEAD.

The trunk-only probe showed 73 -> 44 ms, but the bench moved 10.38k ->
10.45k; this isolates the split inside the complete windowed_exact graph.

Run: python tools/prof_dnsmos_split_e2e.py
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

from fast_speech_enhancement_metrics_tpu.models import dnsmos_net as dn

BATCH, DUR = 64, 16
AUD = BATCH * DUR
CHAIN_K = 32

params = dn.load_params()
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
NUM_WINDOWS = (audio.shape[1] - 144160) // 16000 + 1


def make(split_on):
    real_split = dn._trunk_conv0_5_split
    if split_on:
        dn._trunk_conv0_5_split = real_split
    else:
        dn._trunk_conv0_5_split = (
            lambda p, z, prec, cd, split=4: dn._trunk_conv0_5(p, z, prec, cd)
        )

    @jax.jit
    def run(a):
        def body(eps, _):
            raw = dn.dnsmos_net_windowed_exact(
                params, a + eps, NUM_WINDOWS, 100, "default", jnp.bfloat16
            )
            s = jnp.sum(raw.astype(jnp.float32))
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    compiled = run.lower(audio).compile()
    dn._trunk_conv0_5_split = real_split
    return compiled


fns = {"split4": make(True), "plain": make(False)}
for r in range(3):
    for name, fn in fns.items():
        np.asarray(fn(audio))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = np.asarray(fn(audio))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(
            f"round {r} {name:7s} {t * 1e3:7.2f} ms/eval -> {AUD / t:6.0f} audio-s/s"
            f" (out={out[0]:.1f})",
            flush=True,
        )
