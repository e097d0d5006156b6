"""Worker for the 2-process ``jax.distributed`` smoke test.

Launched by tests/test_distributed.py with env:
  FSEM_DIST_COORD  — coordinator address (localhost:port)
  FSEM_DIST_NPROC  — number of processes
  FSEM_DIST_PID    — this process's id
  FSEM_DIST_OUT    — path to write process-0's scores (npz)

Each process brings 4 virtual CPU devices; the global mesh is
(data=8, model=1). Both processes build the same host batch; LSD runs
data-parallel over the global mesh (each process feeds its addressable
shards), and process 0 compares the all-gathered scores against a
locally-computed single-process reference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fast_speech_enhancement_metrics_tpu.parallel.mesh import (
    create_mesh,
    initialize_distributed,
)


def main():
    coord = os.environ["FSEM_DIST_COORD"]
    nproc = int(os.environ["FSEM_DIST_NPROC"])
    pid = int(os.environ["FSEM_DIST_PID"])

    initialize_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    from jax.experimental import multihost_utils

    from fast_speech_enhancement_metrics_tpu import LSD

    rs = np.random.RandomState(11)
    clean = rs.randn(8, 16000).astype(np.float32)
    noisy = clean + 0.3 * rs.randn(8, 16000).astype(np.float32)

    mesh = create_mesh(data=4 * nproc, model=1)
    metric = LSD(mesh=mesh)
    scores = metric.compute(clean, noisy)  # global sharded (8,) array
    gathered = multihost_utils.process_allgather(scores["LSD"], tiled=True)

    if pid == 0:
        single = LSD(device=jax.local_devices()[0]).compute(clean, noisy)
        ref = np.asarray(single["LSD"])
        np.savez(
            os.environ["FSEM_DIST_OUT"], distributed=np.asarray(gathered), single=ref
        )
    # all processes must reach shutdown together (collectives are global)
    multihost_utils.sync_global_devices("fsem_dist_done")
    print(f"WORKER_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
