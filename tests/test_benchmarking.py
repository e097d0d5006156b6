"""Smoke tests for the benchmarking stack (CPU, tiny sizes)."""

import json

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import bench_one
from fast_speech_enhancement_metrics_tpu.benchmarking.sweep import run_sweep


def test_bench_one_record(speech_data):
    from fast_speech_enhancement_metrics_tpu import LSD

    record = bench_one(
        "LSD",
        LSD(),
        speech_data["speech"][:2],
        speech_data["noisy_speech"][:2],
        duration_s=4,
        time_budget_s=0.2,
    )
    assert record["metric"] == "LSD"
    assert record["batch"] == 2
    assert record["audio_seconds_per_s"] > 0
    assert record["speedup_vs_ref_gpu"] == record["audio_seconds_per_s"] / 208000.0


def test_sweep_writes_results(tmp_path):
    run_sweep(
        batch_sizes=[1, 2],
        duration_s=1,
        time_budget_s=0.1,
        metrics=["LSD"],
        results_dir=str(tmp_path),
    )
    for batch in (1, 2):
        path = tmp_path / f"batch_size_{batch}" / "LSD_results.json"
        assert path.exists()
        with open(path) as f:
            record = json.load(f)
        assert record["batch"] == batch
