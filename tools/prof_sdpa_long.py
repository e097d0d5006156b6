"""Long-audio attention A/B: einsum vs flash vs sdpa at 1999/3999/7999 frames.

Extends round 2's crossover sweep (tools/prof_flash_crossover.py, batch 4)
with the single-pass sdpa kernel; decides the over-capacity impl in
SpeechBERTScore._resolve_impl.

Run: python tools/prof_sdpa_long.py [batch]
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

from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG,
    hubert_hidden_state,
    init_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)


def encoder(impl, t_samples):
    @jax.jit
    def run(a):
        out = hubert_hidden_state(
            params, a, MHUBERT_147_CONFIG, output_layer=8,
            precision="default", attention_impl=impl,
            act_dtype=jnp.bfloat16, gelu="tanh",
        )
        return jnp.sum(out[:, ::64, ::64])

    return run


for frames in (1999, 3999, 7999):
    t_samples = (frames + 1) * 320
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((BATCH, t_samples)), dtype=jnp.float32)
    for impl in ("einsum", "flash", "sdpa"):
        logits_gb = BATCH * 2 * 12 * frames * frames * 4 / 1e9
        if impl == "einsum" and logits_gb > 8.0:
            print(f"frames={frames} {impl:7s} skipped (logits {logits_gb:.0f} GB)", flush=True)
            continue
        fn = encoder(impl, t_samples)
        try:
            np.asarray(fn(a))
        except Exception as e:
            print(f"frames={frames} {impl:7s} FAILED: {type(e).__name__} {str(e)[:80]}", flush=True)
            continue
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = np.asarray(fn(a))
        t = (time.perf_counter() - t0) / reps
        print(f"frames={frames} {impl:7s} {t * 1e3:8.1f} ms (out={float(out):.2f})", flush=True)
