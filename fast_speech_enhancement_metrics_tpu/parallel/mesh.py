"""Device mesh construction and multi-host initialization.

This layer has no counterpart in the reference, which is strictly
single-process/single-device (reference: fast_se_metrics/base.py:10-14 — a
``use_gpu`` flag is its entire device model). Scaling a batched-metrics
workload on TPU is:

* a 2-D ``Mesh(('data', 'model'))`` over the slice: utterance batches shard
  over ``data`` (the embarrassingly parallel axis), large encoders
  (mHuBERT-147) shard over ``model`` (tensor parallelism),
* XLA collectives over ICI within the slice (psum for score reductions,
  all_gather for result assembly) — inserted by GSPMD from sharding
  annotations, never hand-written,
* ``jax.distributed.initialize`` for multi-host process groups (DCN between
  hosts carries only dispatch metadata; all tensor traffic rides ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(**kwargs) -> None:
    """Join the multi-host process group (no-op if already initialized or
    single-process). Safe to call unconditionally at program start."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process environment


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``('data', 'model')`` mesh over the available devices.

    ``data=-1`` absorbs all remaining devices after the ``model`` axis is
    fixed. The model axis is laid out over *adjacent* devices so tensor
    parallel collectives ride the shortest ICI hops.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model < 1 or n % model != 0:
        raise ValueError(f"model={model} must divide device count {n}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data * model} != device count {n}")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
