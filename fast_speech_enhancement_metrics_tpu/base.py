"""Base runtime: device/mesh placement, input preparation, jit-per-shape cache.

TPU-first re-design of the reference's ``BaseMetric`` template
(reference: fast_se_metrics/base.py:6-43). Differences by design:

* the compute path is a *pure function* ``_compute(clean, denoised) ->
  dict[str, (B,) Array]`` jitted once per input shape (XLA recompiles only on
  new shapes; results are cached by jax),
* resampling happens *inside* the jitted graph (fused with the metric),
* device→host sync happens once per call (one ``np.asarray`` of small score
  vectors) instead of one ``.item()`` per utterance,
* batches can be sharded over a ``data`` mesh axis by passing a
  ``jax.sharding.Mesh`` — scores come back replicated/gathered.
"""

from __future__ import annotations

import abc
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.ops.resample import resample


def _to_numpy(audio: Any) -> np.ndarray:
    """Accept torch tensors / numpy arrays / jax arrays / lists."""
    if isinstance(audio, jnp.ndarray):
        return np.asarray(audio)
    if hasattr(audio, "detach"):  # torch tensor without importing torch
        audio = audio.detach().cpu()
    return np.asarray(audio)


class BaseMetric(abc.ABC):
    """Template for all metrics.

    Subclasses implement ``_compute(clean, denoised) -> dict[str, (B,) Array]``
    operating on audio already at ``EXPECTED_SAMPLING_RATE``. ``__call__``
    matches the reference API: returns ``list[dict[str, float]]``.
    """

    higher_is_better: bool
    EXPECTED_SAMPLING_RATE: int
    #: metric consumes only the denoised signal (non-intrusive, e.g. DNSMOS)
    NON_INTRUSIVE: bool = False
    #: matmul precision for the fused input resample; metrics whose agreement
    #: contract has headroom may override with "high" (bf16x3, ~1e-6 rel)
    RESAMPLE_PRECISION: str = "highest"

    def __init__(
        self,
        sample_rate: int = 16000,
        device: jax.Device | None = None,
        mesh: jax.sharding.Mesh | None = None,
        dtype: jnp.dtype = jnp.float32,
    ):
        self.sample_rate = sample_rate
        self.mesh = mesh
        self.dtype = dtype
        if device is None and mesh is None:
            device = jax.devices()[0]
        self.device = device
        self._jitted = jax.jit(self._compute_resampled)

    def _on_tpu(self) -> bool:
        """True when this metric's compute placement is TPU. Gates the Pallas
        kernel paths — must check the metric's own device, NOT
        ``jax.default_backend()``: with a TPU backend present, a metric
        explicitly placed on CPU (tests/test_device_consistency.py) would
        otherwise try to lower Pallas TPU kernels for the CPU backend."""
        devices = (
            list(self.mesh.devices.flat) if self.mesh is not None else [self.device]
        )
        return all(d is not None and d.platform == "tpu" for d in devices)

    # -- input pipeline -----------------------------------------------------

    def _sharding(self):
        if self.mesh is not None:
            return jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
        return self.device

    def prepare_audio(self, audio: Any) -> jnp.ndarray:
        a = _to_numpy(audio).astype(np.float32)
        if a.ndim == 1:
            a = a[None, :]
        if a.ndim != 2:
            raise ValueError(f"audio must be 1-D or 2-D, got shape {a.shape}")
        return jax.device_put(a, self._sharding())

    def prepare_inputs(self, clean_speech, denoised_speech):
        if clean_speech is not None:
            c = _to_numpy(clean_speech)
            d = _to_numpy(denoised_speech)
            if c.shape != d.shape:
                raise ValueError(
                    "`clean_speech` and `denoised_speech` should have the same shape."
                )
        clean = None if clean_speech is None else self.prepare_audio(clean_speech)
        denoised = self.prepare_audio(denoised_speech)
        return clean, denoised

    def _compute_resampled(self, clean, denoised):
        if self.sample_rate != self.EXPECTED_SAMPLING_RATE:
            prec = self.RESAMPLE_PRECISION
            if clean is not None:
                clean = resample(
                    clean, self.sample_rate, self.EXPECTED_SAMPLING_RATE, prec
                )
            denoised = resample(
                denoised, self.sample_rate, self.EXPECTED_SAMPLING_RATE, prec
            )
        return self._compute(clean, denoised)

    # -- compute ------------------------------------------------------------

    @abc.abstractmethod
    def _compute(self, clean: jnp.ndarray | None, denoised: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """Pure, jittable. Inputs at EXPECTED_SAMPLING_RATE. Returns (B,) arrays."""

    def _run_prepared(self, clean, denoised) -> dict[str, jnp.ndarray]:
        """Score already-device-placed audio. Subclasses may override to run
        host-orchestrated execution plans (e.g. chunk loops over a smaller
        jitted graph); the default is the single fused graph."""
        return self._jitted(clean, denoised)

    def compute(self, clean_speech, denoised_speech) -> dict[str, jnp.ndarray]:
        """Functional API: returns a dict of per-utterance score arrays (on device)."""
        clean, denoised = self.prepare_inputs(clean_speech, denoised_speech)
        return self._run_prepared(clean, denoised)

    def __call__(self, clean_speech, denoised_speech) -> list[dict[str, float]]:
        scores = self.compute(clean_speech, denoised_speech)
        host = {k: np.asarray(v) for k, v in scores.items()}
        batch = next(iter(host.values())).shape[0]
        return [
            {k: float(v[i]) for k, v in host.items()} for i in range(batch)
        ]
