"""Run a command when the time-shared chip is quiet.

Probes the scanned-protocol canary; when it clears the threshold (a quiet
co-tenant window), execs the given command. Gives up after --max-wait and
runs anyway (the bench's own best-of-N still applies).

Usage: python tools/quiet_run.py [--min-tflops 15] [--max-wait 3600] -- cmd ...
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = """
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/fsem_jax_cache')
from fast_speech_enhancement_metrics_tpu.benchmarking.runner import (
    configure_cache, _scanned_protocol_canary)
configure_cache()
print('SCAN_TFLOPS', _scanned_protocol_canary())
"""


def probe() -> float:
    out = subprocess.run(
        [sys.executable, "-c", PROBE], capture_output=True, text=True, timeout=600
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCAN_TFLOPS"):
            return float(line.split()[1])
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-tflops", type=float, default=15.0)
    ap.add_argument("--max-wait", type=float, default=3600.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd

    t0 = time.time()
    while True:
        try:
            tf = probe()
        except Exception as e:
            print(f"# probe failed: {e}", flush=True)
            tf = 0.0
        waited = time.time() - t0
        print(f"# scan canary {tf:.1f} TFLOP/s after {waited:.0f}s", flush=True)
        if tf >= args.min_tflops or waited > args.max_wait:
            break
        time.sleep(180)
    os.execvp(cmd[0], cmd)


if __name__ == "__main__":
    main()
