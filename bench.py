"""Throughput benchmark on the real TPU chip.

Mirrors the reference's benchmark protocol (reference:
benchmark_metrics.py:17-19,49-84 — batch-64 16 s clips, inputs pre-placed on
device before timing, warmup discarded) but measures honestly with
``block_until_ready`` and reports **audio-seconds per second per chip**.

Prints ONE JSON line: the geometric-mean speedup over the reference's
published GPU numbers (BASELINE.md). Per-metric details stream as ``#``
comment lines and land in ``results/bench_details.json``.

Env knobs:
  FSEM_BENCH_BATCH (default 64)   FSEM_BENCH_DUR (default 16)
  FSEM_BENCH_METRICS (comma list) FSEM_BENCH_SECONDS (time budget per metric)
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np

# persistent compilation cache: the model metrics' conv/attention graphs
# compile slowly through remote-compile tunnels; cache across runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (  # noqa: E402
    bench_one,
    make_metrics,
)

BATCH = int(os.environ.get("FSEM_BENCH_BATCH", 64))
DURATION_S = int(os.environ.get("FSEM_BENCH_DUR", 16))
SAMPLE_RATE = 16000
TIME_BUDGET_S = float(os.environ.get("FSEM_BENCH_SECONDS", 10))


def main() -> None:
    from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data

    clean, noisy, _ = load_audio_data(DURATION_S, BATCH, SAMPLE_RATE)

    selected = os.environ.get("FSEM_BENCH_METRICS")
    factories = make_metrics(SAMPLE_RATE)
    if selected:
        factories = {k: factories[k] for k in selected.split(",")}

    details = []
    for name, factory in factories.items():
        metric = None
        try:
            metric = factory()
            result = bench_one(name, metric, clean, noisy, DURATION_S, TIME_BUDGET_S)
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
