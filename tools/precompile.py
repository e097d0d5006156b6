"""Pre-populate the XLA compilation cache for the benchmark graphs.

Some remote-compile environments lose individual compile requests (the
client waits on a reply that never comes) while fresh submissions of the
same graph succeed in minutes. This tool compiles each benchmark graph in a
DISPOSABLE subprocess with a timeout, retrying until the persistent cache
(bench.py's ``JAX_COMPILATION_CACHE_DIR``) holds it. Run before ``bench.py``
on a cold cache:

    python tools/precompile.py [--batch 64] [--duration 16]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

SNIPPETS = {
    "dnsmos_segment": """
import jax, jax.numpy as jnp, numpy as np
from fast_speech_enhancement_metrics_tpu import DNSMOS
m = DNSMOS(host_chunk=16, conv_dtype=jnp.bfloat16)
audio = jnp.asarray(np.zeros(({batch}, {samples}), np.float32))
jax.block_until_ready(m._segment_jitted(audio))
""",
    "dnsmos_net_chunk": """
import jax, jax.numpy as jnp, numpy as np
from fast_speech_enhancement_metrics_tpu import DNSMOS
m = DNSMOS(host_chunk=16, conv_dtype=jnp.bfloat16)
w = jnp.asarray(np.zeros((16, m.window), np.float32))
jax.block_until_ready(m._net_jitted(w))
""",
    "sbs_encode_chunk": """
import jax, jax.numpy as jnp, numpy as np
from fast_speech_enhancement_metrics_tpu.models.hubert import (
    MHUBERT_147_CONFIG, init_params, hubert_hidden_state)
params = init_params(jax.random.key(0), MHUBERT_147_CONFIG)
a = jnp.asarray(np.zeros((16, {samples}), np.float32))
f = jax.jit(lambda x: hubert_hidden_state(params, x, MHUBERT_147_CONFIG,
    output_layer=8, precision="default", attention_impl="einsum"))
jax.block_until_ready(f(a))
""",
    "sbs_f1": """
import jax, jax.numpy as jnp, numpy as np
from fast_speech_enhancement_metrics_tpu.models.hubert import MHUBERT_147_CONFIG, init_params
from fast_speech_enhancement_metrics_tpu import SpeechBERTScore
m = SpeechBERTScore(params=init_params(jax.random.key(0), MHUBERT_147_CONFIG), host_chunk=16)
frames = ({samples} - 400) // 320 + 1
e = jnp.asarray(np.zeros(({batch}, frames, 768), np.float32))
jax.block_until_ready(jax.jit(m._f1_from_embeddings)(e, e))
""",
}

PREAMBLE = """
import jax, os
jax.config.update("jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
"""


def compile_target(name: str, code: str, timeout_s: float, attempts: int) -> bool:
    for attempt in range(1, attempts + 1):
        t0 = time.time()
        try:
            subprocess.run(
                [sys.executable, "-c", PREAMBLE + code],
                timeout=timeout_s,
                check=True,
                capture_output=True,
            )
            print(f"[precompile] {name}: ok in {time.time() - t0:.0f}s "
                  f"(attempt {attempt})", flush=True)
            return True
        except subprocess.TimeoutExpired:
            print(f"[precompile] {name}: attempt {attempt} timed out after "
                  f"{timeout_s:.0f}s (request likely lost) — retrying", flush=True)
        except subprocess.CalledProcessError as e:
            print(f"[precompile] {name}: failed\n{e.stderr.decode()[-2000:]}",
                  flush=True)
            return False
    return False


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--duration", type=int, default=16)
    parser.add_argument("--timeout", type=float, default=480.0)
    parser.add_argument("--attempts", type=int, default=4)
    args = parser.parse_args()

    samples = args.duration * 16000
    for name, template in SNIPPETS.items():
        code = template.format(batch=args.batch, samples=samples)
        compile_target(name, code, args.timeout, args.attempts)


if __name__ == "__main__":
    main()
