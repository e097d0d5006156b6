"""CLI shim: generate all benchmark figures (reference: plot_results.py)."""

from fast_speech_enhancement_metrics_tpu.benchmarking.plots import main

if __name__ == "__main__":
    main()
