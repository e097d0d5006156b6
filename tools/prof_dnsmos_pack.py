"""DNSMOS A/B on the real chip: MXU width-packed convs vs plain convs.

Full-metric interleaved comparison at the bench configuration
(shared_exact plan, conv_dtype=bf16, batch 64 x 16 s) through the scanned
device-throughput protocol, plus score agreement.

Run: python tools/prof_dnsmos_pack.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    SCAN_K,
    _scanned,
    configure_cache,
)

configure_cache()

from fast_speech_enhancement_metrics_tpu import DNSMOS

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BATCH, DUR = 64, 16
AUD = BATCH * DUR

rng = np.random.default_rng(0)
den = jnp.asarray(0.1 * rng.standard_normal((BATCH, DUR * 16000)), dtype=jnp.float32)

metrics = {
    "plain": DNSMOS(conv_dtype=jnp.bfloat16, conv_pack=None),
    "packed": DNSMOS(conv_dtype=jnp.bfloat16, conv_pack="mxu"),
}

scores = {}
for name, m in metrics.items():
    t0 = time.perf_counter()
    scores[name] = {
        k: np.asarray(v) for k, v in m._jitted(None, den).items()
    }
    print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

for name in ("packed",):
    dev = max(
        np.abs(scores[name][k] - scores["plain"][k]).max() for k in ("SIG", "BAK", "OVRL")
    )
    print(f"# score dev {name} vs plain(bf16): {dev:.2e}", flush=True)

runners = {
    name: _scanned(m._compute_resampled, intrusive=False)
    for name, m in metrics.items()
}
for name, r in runners.items():
    t0 = time.perf_counter()
    np.asarray(r(None, den, 0)["OVRL"])
    print(f"# scanned-compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in runners}
for r in range(ROUNDS):
    for name, runner in runners.items():
        t0 = time.perf_counter()
        np.asarray(runner(None, den, r + 1)["OVRL"])
        t = time.perf_counter() - t0
        thr = AUD * SCAN_K / t
        results[name].append(thr)
        print(f"round {r} {name:10s} {t/SCAN_K*1e3:8.2f} ms/eval -> {thr:8.0f} audio-s/s", flush=True)

print()
for name, ts in results.items():
    print(f"MEDIAN {name:10s} {np.median(ts):8.0f} audio-s/s", flush=True)
