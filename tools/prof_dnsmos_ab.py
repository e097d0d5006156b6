"""DNSMOS A/B: reshape-max vs reduce_window pool x fused vs gather feats.

The standalone pool probe said reshape-max wins 3.4x, but the full-graph
bench regressed 10.5k -> 9.4k audio-s/s; this isolates which change (if
either) hurts inside the fused shared_exact graph, with the chained
protocol and interleaved rounds.

Run: python tools/prof_dnsmos_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

from fast_speech_enhancement_metrics_tpu.models import dnsmos_net as dn

BATCH, DUR = 64, 16
AUD = BATCH * DUR
CHAIN_K = 16

params = dn.load_params()
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)
NUM_WINDOWS = (audio.shape[1] - 144160) // 16000 + 1


def pool_reshape(x):
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    v = x[:, :h, :w, :].reshape(x.shape[0], h // 2, 2, w // 2, 2, x.shape[3])
    return jnp.max(jnp.max(v, axis=4), axis=2)


def pool_rw(x):
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    return lax.reduce_window(
        x[:, :h, :w, :], -jnp.inf, lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def feats_fused(params, audio, precision):
    n_chunks = audio.shape[1] // 160
    f = n_chunks - 1
    chunks = audio[:, : n_chunks * 160].reshape(audio.shape[0], n_chunks, 160)
    w = jnp.concatenate(
        [
            params["stft_real"][:160],
            params["stft_imag"][:160],
            params["stft_real"][160:],
            params["stft_imag"][160:],
        ],
        axis=1,
    )
    a = jnp.einsum("nck,kr->ncr", chunks, w, precision=precision)
    nb = params["stft_real"].shape[1]
    real = a[:, :f, 0 * nb : 1 * nb] + a[:, 1:, 2 * nb : 3 * nb]
    imag = a[:, :f, 1 * nb : 2 * nb] + a[:, 1:, 3 * nb : 4 * nb]
    power = jnp.square(real) + jnp.square(imag)
    return jnp.log10(jnp.maximum(power, 1e-12))


def feats_gather(params, audio, precision):
    from fast_speech_enhancement_metrics_tpu.ops.stft import frame

    frames = frame(audio, 320, 160)
    real = jnp.einsum("nfk,kr->nfr", frames, params["stft_real"], precision=precision)
    imag = jnp.einsum("nfk,kr->nfr", frames, params["stft_imag"], precision=precision)
    power = jnp.square(real) + jnp.square(imag)
    return jnp.log10(jnp.maximum(power, 1e-12))


def make(pool, feats):
    dn._max_pool_2x2 = pool
    dn._log_power_features = feats

    def fn(a):
        raw = dn.dnsmos_net_windowed_exact(
            params, a, NUM_WINDOWS, 100, "default", jnp.bfloat16
        )
        return jnp.sum(raw.astype(jnp.float32))

    @jax.jit
    def run(a):
        def body(eps, _):
            s = fn(a + eps)
            return s * jnp.float32(1e-30), s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN_K)
        return outs

    # trace NOW while the monkeypatch is active
    lowered = run.lower(audio)
    return lowered.compile()


configs = {
    "reshape+fused": (pool_reshape, feats_fused),
    "rw+fused": (pool_rw, feats_fused),
    "reshape+gather": (pool_reshape, feats_gather),
    "rw+gather": (pool_rw, feats_gather),
}
compiled = {}
for name, (pool, feats) in configs.items():
    t0 = time.perf_counter()
    compiled[name] = make(pool, feats)
    print(f"{name:16s} compile {time.perf_counter() - t0:6.1f} s", flush=True)

for r in range(3):
    for name, fn in compiled.items():
        np.asarray(fn(audio))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = np.asarray(fn(audio))
        t = (time.perf_counter() - t0) / reps / CHAIN_K
        print(
            f"round {r} {name:16s} {t * 1e3:7.2f} ms/eval -> {AUD / t:6.0f} audio-s/s"
            f" (out={out[0]:.1f})",
            flush=True,
        )
