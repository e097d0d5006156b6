"""Publication plots from sweep results (reference: benchmarking/plotting/*).

Produces the same three figure families as the reference:

* ``plots/samples_per_second.png`` — per-metric throughput bars with speedup
  annotations vs the reference's published GPU numbers,
* ``plots/samples_per_second_scaling.png`` — throughput vs batch size,
* ``plots/deviations.png`` — per-utterance deviation of TPU scores vs the
  float64 oracles (the agreement contract, visualized).

Usage::

    python -m fast_speech_enhancement_metrics_tpu.benchmarking.plots
"""

from __future__ import annotations

import json
from pathlib import Path

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    REFERENCE_GPU_AUDIO_S,
)

METRIC_ORDER = ["PESQ", "STOI", "SDR", "LSD", "DNSMOS", "SpeechBERTScore"]


def load_results(results_dir: str = "results") -> dict:
    """{metric: {batch: record}} from the sweep output tree."""
    out: dict = {}
    for batch_dir in sorted(Path(results_dir).glob("batch_size_*")):
        batch = int(batch_dir.name.rsplit("_", 1)[1])
        for path in batch_dir.glob("*_results.json"):
            with open(path) as f:
                record = json.load(f)
            out.setdefault(record["metric"], {})[batch] = record
    return out


def plot_samples_per_second(results, out="plots/samples_per_second.png", batch=64):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = [m for m in METRIC_ORDER if m in results and batch in results[m]]
    ours = [results[m][batch]["samples_per_s"] for m in names]
    ref = [REFERENCE_GPU_AUDIO_S[m] / 16.0 for m in names]

    fig, ax = plt.subplots(figsize=(9, 4.5))
    x = range(len(names))
    ax.bar([i - 0.2 for i in x], ref, width=0.4, label="reference GPU", color="#999")
    ax.bar([i + 0.2 for i in x], ours, width=0.4, label="ours TPU (1 chip)", color="#1f77b4")
    for i, (o, r) in enumerate(zip(ours, ref)):
        speedup = o / r
        label = f"{speedup:.0f}×" if speedup >= 10 else f"{speedup:.2f}×"
        ax.text(i + 0.2, o, label, ha="center", va="bottom", fontsize=9)
    ax.set_yscale("log")
    ax.set_xticks(list(x), names, rotation=15)
    ax.set_ylabel("samples/s (16 s clips, batch 64)")
    ax.legend()
    fig.tight_layout()
    Path(out).parent.mkdir(exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)


def plot_scaling(results, out="plots/samples_per_second_scaling.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name in METRIC_ORDER:
        if name not in results:
            continue
        batches = sorted(results[name])
        ax.plot(
            batches,
            [results[name][b]["samples_per_s"] for b in batches],
            marker="o",
            label=name,
        )
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("batch size")
    ax.set_ylabel("samples/s")
    ax.legend(fontsize=8)
    fig.tight_layout()
    Path(out).parent.mkdir(exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)


def plot_deviations(out="plots/deviations.png", num_samples: int = 8, duration_s: int = 4):
    """Scatter our device scores against the float64 oracles."""
    import sys

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from fast_speech_enhancement_metrics_tpu import DNSMOS, LSD, PESQ, SDR, STOI
    from fast_speech_enhancement_metrics_tpu.ops.resample import resample
    from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data
    from tests.oracles.dnsmos_oracle import dnsmos_oracle
    from tests.oracles.lsd_oracle import lsd_oracle
    from tests.oracles.pesq_oracle import pesq_oracle
    from tests.oracles.sdr_oracle import sdr_oracle
    from tests.oracles.stoi_oracle import stoi_oracle

    clean, noisy, _ = load_audio_data(duration_s, num_samples, 16000)
    c10 = np.asarray(resample(clean, 16000, 10000))
    d10 = np.asarray(resample(noisy, 16000, 10000))
    stoi_exp, estoi_exp = stoi_oracle(c10, d10)

    cases = {
        "PESQ": (PESQ(), "PESQ", pesq_oracle(clean, noisy)),
        "STOI": (STOI(sample_rate=16000), "STOI", stoi_exp),
        "ESTOI": (None, "ESTOI", estoi_exp),
        "SDR": (SDR(), "SDR", sdr_oracle(clean, noisy)),
        "LSD": (LSD(), "LSD", lsd_oracle(clean, noisy)),
        "DNSMOS": (DNSMOS(), "OVRL", dnsmos_oracle(noisy)["OVRL"]),
    }

    fig, axes = plt.subplots(2, 3, figsize=(12, 7))
    stoi_scores = None
    for ax, (title, (metric, key, expected)) in zip(axes.flat, cases.items()):
        if metric is None:
            scores = stoi_scores  # ESTOI rides the STOI call
        else:
            scores = metric(None if metric.NON_INTRUSIVE else clean, noisy)
            if title == "STOI":
                stoi_scores = scores
        ours = np.array([r[key] for r in scores])
        dev = float(np.abs(ours - expected).max())
        ax.scatter(expected, ours, s=18)
        lo, hi = min(expected.min(), ours.min()), max(expected.max(), ours.max())
        ax.plot([lo, hi], [lo, hi], "k--", lw=0.7)
        ax.set_title(f"{title}  (max dev {dev:.1e})", fontsize=10)
        ax.set_xlabel("float64 oracle")
        ax.set_ylabel("ours (TPU)")
    fig.tight_layout()
    Path(out).parent.mkdir(exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)


def main() -> None:
    results = load_results()
    if results:
        batches = {b for r in results.values() for b in r}
        plot_samples_per_second(results, batch=64 if 64 in batches else max(batches))
        plot_scaling(results)
    plot_deviations()
    print("plots written to plots/")


if __name__ == "__main__":
    main()
