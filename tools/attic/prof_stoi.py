"""Decompose STOI cost on chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache
configure_cache()
from fast_speech_enhancement_metrics_tpu import STOI
from fast_speech_enhancement_metrics_tpu.ops.resample import resample

B, T, K = 64, 256000, 32
rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
d = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
m = STOI(sample_rate=16000)

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

def resample_only(c, d):
    return jnp.sum(resample(c, 16000, 10000), -1) + jnp.sum(resample(d, 16000, 10000), -1)

def silent_only(c, d):
    c1 = resample(c, 16000, 10000)
    d1 = resample(d, 16000, 10000)
    cs, ds, ln = m._remove_silent_frames(c1, d1)
    return jnp.sum(cs, -1) + jnp.sum(ds, -1) + ln

def bands_only(c, d):
    c1 = resample(c, 16000, 10000)
    d1 = resample(d, 16000, 10000)
    cs, ds, ln = m._remove_silent_frames(c1, d1)
    speech = jnp.concatenate([cs, ds], axis=0)
    tob = m._band_envelopes(speech, jnp.concatenate([ln, ln]))
    return jnp.sum(tob, (1, 2))

def full(c, d):
    return m._compute_resampled(c, d)["STOI"]

timed("resample 16k->10k only", resample_only)
timed("+ remove_silent_frames", silent_only)
timed("+ band envelopes (DFT)", bands_only)
timed("full STOI", full)

# inner pieces of remove_silent_frames
from fast_speech_enhancement_metrics_tpu.ops.stft import frame as frame_op
def frames_energies(c, d):
    c1 = resample(c, 16000, 10000)
    d1 = resample(d, 16000, 10000)
    win = jnp.asarray(m.window)
    cf = frame_op(c1, 256, 128) * win
    df = frame_op(d1, 256, 128) * win
    en = 20.0 * jnp.log10(jnp.linalg.norm(cf, axis=2) + 1e-9)
    return jnp.sum(en, -1) + jnp.sum(df, (1, 2))

def plus_argsort(c, d):
    c1 = resample(c, 16000, 10000)
    win = jnp.asarray(m.window)
    cf = frame_op(c1, 256, 128) * win
    en = 20.0 * jnp.log10(jnp.linalg.norm(cf, axis=2) + 1e-9)
    keep = (jnp.amax(en, axis=1, keepdims=True) - 40.0 - en) < 0
    order = jnp.argsort(jnp.logical_not(keep), axis=1, stable=True)
    return jnp.sum(order, -1) + jnp.sum(cf, (1, 2))

def plus_gather(c, d):
    c1 = resample(c, 16000, 10000)
    d1 = resample(d, 16000, 10000)
    win = jnp.asarray(m.window)
    cf = frame_op(c1, 256, 128) * win
    df = frame_op(d1, 256, 128) * win
    en = 20.0 * jnp.log10(jnp.linalg.norm(cf, axis=2) + 1e-9)
    keep = (jnp.amax(en, axis=1, keepdims=True) - 40.0 - en) < 0
    order = jnp.argsort(jnp.logical_not(keep), axis=1, stable=True)
    ck = jnp.take_along_axis(cf, order[:, :, None], axis=1)
    dk = jnp.take_along_axis(df, order[:, :, None], axis=1)
    return jnp.sum(ck, (1, 2)) + jnp.sum(dk, (1, 2))

timed("resample+frame+energies", frames_energies)
timed("resample+frame+argsort", plus_argsort)
timed("resample+frame+argsort+gather", plus_gather)
