"""Throughput benchmark on the real TPU chip.

Mirrors the reference's benchmark protocol (reference:
benchmark_metrics.py:17-19,49-84 — batch-64 16 s clips, inputs pre-placed on
device before timing, warmup discarded) but measures honestly with
``block_until_ready`` and reports **audio-seconds per second per chip**.

Prints ONE JSON line: the geometric-mean speedup over the reference's
published GPU numbers (BASELINE.md — read off plots/samples_per_second.png).
Per-metric details go to ``results/bench_details.json``.

Env knobs:
  FSEM_BENCH_BATCH (default 64)   FSEM_BENCH_DUR (default 16)
  FSEM_BENCH_METRICS (comma list) FSEM_BENCH_SECONDS (time budget per metric)
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

BATCH = int(os.environ.get("FSEM_BENCH_BATCH", 64))
DURATION_S = int(os.environ.get("FSEM_BENCH_DUR", 16))
SAMPLE_RATE = 16000
TIME_BUDGET_S = float(os.environ.get("FSEM_BENCH_SECONDS", 10))

#: reference "ours GPU" throughput at batch 64 in audio-seconds/s
#: (samples/s read off plots/samples_per_second.png x 16 s — BASELINE.md)
REFERENCE_GPU_AUDIO_S = {
    "PESQ": 6_400.0,
    "STOI": 21_600.0,
    "SDR": 104_000.0,
    "LSD": 208_000.0,
    "DNSMOS": 4_160.0,
    "SpeechBERTScore": 2_720.0,
}


def make_metrics():
    from fast_speech_enhancement_metrics_tpu import (
        DNSMOS,
        LSD,
        PESQ,
        SDR,
        STOI,
        SpeechBERTScore,
    )

    metrics = {
        "PESQ": lambda: PESQ(),
        "STOI": lambda: STOI(sample_rate=SAMPLE_RATE),
        "SDR": lambda: SDR(),
        "LSD": lambda: LSD(),
        "DNSMOS": lambda: DNSMOS(segment_chunk=16),
    }

    def make_sbs():
        from fast_speech_enhancement_metrics_tpu.metrics.speechbertscore import (
            DEFAULT_CHECKPOINT,
        )

        if Path(DEFAULT_CHECKPOINT).exists():
            return SpeechBERTScore(batch_chunk=16)
        # zero-egress: real mHuBERT-147 weights unavailable -> random weights
        # of the identical architecture (same FLOPs, same memory traffic)
        import jax

        from fast_speech_enhancement_metrics_tpu.models.hubert import (
            MHUBERT_147_CONFIG,
            init_params,
        )

        return SpeechBERTScore(
            params=init_params(jax.random.key(0), MHUBERT_147_CONFIG),
            batch_chunk=16,
        )

    metrics["SpeechBERTScore"] = make_sbs
    return metrics


def bench_one(name: str, metric, clean, noisy) -> dict:
    import jax

    prepared_clean, prepared_noisy = metric.prepare_inputs(
        None if metric.NON_INTRUSIVE else clean, noisy
    )

    def run():
        scores = metric._jitted(prepared_clean, prepared_noisy)
        jax.block_until_ready(scores)
        return scores

    t0 = time.time()
    run()
    compile_s = time.time() - t0

    # warmup + calibrate iteration count to the time budget
    t0 = time.time()
    run()
    per_call = max(time.time() - t0, 1e-4)
    iters = max(3, int(TIME_BUDGET_S / per_call))

    t0 = time.time()
    for _ in range(iters):
        run()
    elapsed = time.time() - t0

    audio_seconds = BATCH * DURATION_S
    throughput = audio_seconds * iters / elapsed
    return {
        "metric": name,
        "audio_seconds_per_s": throughput,
        "samples_per_s": throughput / DURATION_S,
        "iters": iters,
        "compile_s": round(compile_s, 2),
        "ref_gpu_audio_seconds_per_s": REFERENCE_GPU_AUDIO_S[name],
        "speedup_vs_ref_gpu": throughput / REFERENCE_GPU_AUDIO_S[name],
    }


def main() -> None:
    from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

    clean, noisy, _ = load_audio_data(DURATION_S, BATCH, SAMPLE_RATE)

    selected = os.environ.get("FSEM_BENCH_METRICS")
    factories = make_metrics()
    if selected:
        factories = {k: factories[k] for k in selected.split(",")}

    details = []
    for name, factory in factories.items():
        metric = None
        try:
            metric = factory()
            result = bench_one(name, metric, clean, noisy)
        except Exception as e:  # keep the suite going; report the failure
            result = {"metric": name, "error": f"{type(e).__name__}: {e}"}
        details.append(result)
        print(f"# {json.dumps(result)}", flush=True)
        del metric  # free device buffers before the next metric

    ok = [d for d in details if "error" not in d]
    speedups = [d["speedup_vs_ref_gpu"] for d in ok]
    geomean = float(np.exp(np.mean(np.log(speedups)))) if speedups else 0.0

    Path("results").mkdir(exist_ok=True)
    with open("results/bench_details.json", "w") as f:
        json.dump(
            {"batch": BATCH, "duration_s": DURATION_S, "details": details}, f, indent=2
        )

    print(
        json.dumps(
            {
                "metric": "suite_geomean_speedup_vs_reference_gpu",
                "value": round(geomean, 3),
                "unit": "x",
                "vs_baseline": round(geomean, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
