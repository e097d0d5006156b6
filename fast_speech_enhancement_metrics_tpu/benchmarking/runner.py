"""Benchmark core: metric factories + honest on-device timing.

The protocol mirrors the reference driver (reference:
benchmark_metrics.py:49-84): inputs are pre-placed on device, warmup is
excluded, wall-clock is measured around the metric call — but with
``jax.block_until_ready`` so asynchronous dispatch cannot flatter the
numbers, and reported in audio-seconds/s/chip.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

def configure_cache() -> None:
    """Point JAX at the persistent compilation cache (persist everything —
    warm processes then submit zero compile requests, which matters in
    remote-compile environments that occasionally lose requests)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


#: reference "ours GPU" throughput at batch 64 in audio-seconds/s
#: (samples/s read off plots/samples_per_second.png x 16 s clips; BASELINE.md)
REFERENCE_GPU_AUDIO_S = {
    "PESQ": 6_400.0,
    "STOI": 21_600.0,
    "SDR": 104_000.0,
    "LSD": 208_000.0,
    "DNSMOS": 4_160.0,
    "SpeechBERTScore": 2_720.0,
}


def make_metrics(sample_rate: int = 16000) -> dict:
    """Factories for all six metrics, benchmark-configured."""
    from fast_speech_enhancement_metrics_tpu import (
        DNSMOS,
        LSD,
        PESQ,
        SDR,
        STOI,
        SpeechBERTScore,
    )

    def make_sbs():
        from fast_speech_enhancement_metrics_tpu.metrics.speechbertscore import (
            DEFAULT_CHECKPOINT,
        )

        if Path(DEFAULT_CHECKPOINT).exists():
            return SpeechBERTScore(host_chunk=16)
        # zero-egress: real mHuBERT-147 weights unavailable -> random weights
        # of the identical architecture (same FLOPs, same memory traffic)
        import jax

        from fast_speech_enhancement_metrics_tpu.models.hubert import (
            MHUBERT_147_CONFIG,
            init_params,
        )

        return SpeechBERTScore(
            params=init_params(jax.random.key(0), MHUBERT_147_CONFIG),
            host_chunk=16,
        )

    import jax.numpy as jnp

    return {
        "PESQ": lambda: PESQ(),
        "STOI": lambda: STOI(sample_rate=sample_rate),
        "SDR": lambda: SDR(),
        "LSD": lambda: LSD(),
        # host_chunk: per-chunk jitted net (compiles in seconds) instead of a
        # giant fused lax.map graph (minutes through remote-compile services)
        "DNSMOS": lambda: DNSMOS(host_chunk=16, conv_dtype=jnp.bfloat16),
        "SpeechBERTScore": make_sbs,
    }


def bench_one(
    name: str,
    metric,
    clean,
    noisy,
    duration_s: float,
    time_budget_s: float = 10.0,
) -> dict:
    """Time one metric on pre-placed device inputs; returns a result record."""
    import jax

    batch = noisy.shape[0]
    prepared_clean, prepared_noisy = metric.prepare_inputs(
        None if metric.NON_INTRUSIVE else clean, noisy
    )

    def run():
        # _run_prepared: the fused jitted graph, or a host-chunked execution
        # plan for the model metrics (see metrics/dnsmos.py)
        scores = metric._run_prepared(prepared_clean, prepared_noisy)
        jax.block_until_ready(scores)
        return scores

    t0 = time.time()
    run()
    compile_s = time.time() - t0

    t0 = time.time()
    run()
    per_call = max(time.time() - t0, 1e-4)
    iters = max(3, int(time_budget_s / per_call))

    t0 = time.time()
    for _ in range(iters):
        run()
    elapsed = time.time() - t0

    profile_dir = os.environ.get("FSEM_BENCH_PROFILE")
    if profile_dir:  # capture an XLA trace of a few steady-state steps
        with jax.profiler.trace(f"{profile_dir}/{name}"):
            for _ in range(min(iters, 3)):
                run()

    audio_seconds = batch * duration_s
    throughput = audio_seconds * iters / elapsed
    record = {
        "metric": name,
        "batch": batch,
        "audio_seconds_per_s": throughput,
        "samples_per_s": throughput / duration_s,
        "iters": iters,
        "compile_s": round(compile_s, 2),
    }
    if name in REFERENCE_GPU_AUDIO_S:
        record["ref_gpu_audio_seconds_per_s"] = REFERENCE_GPU_AUDIO_S[name]
        record["speedup_vs_ref_gpu"] = throughput / REFERENCE_GPU_AUDIO_S[name]
    return record
