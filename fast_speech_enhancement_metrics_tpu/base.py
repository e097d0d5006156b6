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


def _is_ragged(audio: Any) -> bool:
    """True for a list/tuple of 1-D utterances with differing lengths."""
    if not isinstance(audio, (list, tuple)) or len(audio) < 2:
        return False
    lengths = set()
    for a in audio:
        if np.isscalar(a) or (hasattr(a, "ndim") and a.ndim != 1):
            return False
        try:
            lengths.add(len(a))
        except TypeError:
            return False
    return len(lengths) > 1


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

    def _data_axis_size(self) -> int:
        if self.mesh is None:
            return 1
        return dict(self.mesh.shape).get("data", 1)

    def prepare_audio(self, audio: Any) -> jnp.ndarray:
        a = _to_numpy(audio).astype(np.float32)
        if a.ndim == 1:
            a = a[None, :]
        if a.ndim != 2:
            raise ValueError(f"audio must be 1-D or 2-D, got shape {a.shape}")
        # under a mesh, pad the batch up to a data-axis multiple so any batch
        # size shards (P("data") requires divisibility); scores are
        # per-utterance, so pad rows (replicas of the last row — real audio,
        # no degenerate-input numerics) cannot leak into real scores and are
        # sliced off host-side in ``compute``
        n = self._data_axis_size()
        if n > 1 and a.shape[0] % n:
            pad = n - a.shape[0] % n
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
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
        a = _to_numpy(denoised_speech)
        b0 = 1 if a.ndim == 1 else a.shape[0]
        clean, denoised = self.prepare_inputs(clean_speech, denoised_speech)
        scores = self._run_prepared(clean, denoised)
        if b0 != denoised.shape[0]:  # mesh pad rows (prepare_audio)
            scores = {k: v[:b0] for k, v in scores.items()}
        return scores

    def __call__(self, clean_speech, denoised_speech) -> list[dict[str, float]]:
        if _is_ragged(denoised_speech):
            return self.compute_ragged(clean_speech, denoised_speech)
        scores = self.compute(clean_speech, denoised_speech)
        host = {k: np.asarray(v) for k, v in scores.items()}
        batch = next(iter(host.values())).shape[0]
        return [
            {k: float(v[i]) for k, v in host.items()} for i in range(batch)
        ]

    def compute_ragged(
        self, clean_speech, denoised_speech
    ) -> list[dict[str, float]]:
        """Score variable-length utterances (a production need the reference's
        fixed-(B, T) API can't serve — unequal lengths raise there).

        Utterances are grouped by **exact length** and each group runs as one
        batched evaluation — no padding ever reaches a metric (zero-padding
        changes PESQ/STOI/LSD values, so a pad-to-bucket scheme would
        silently alter scores; the only deviations vs per-utterance calls are
        batch-size-dependent XLA reassociation, identical in kind to any
        batched call). One jitted graph per distinct length (XLA's jit
        cache); callers who want fewer compiles can pre-pad to their own
        buckets. ``__call__`` routes list inputs with unequal lengths here.
        """
        den = [_to_numpy(d).astype(np.float32) for d in denoised_speech]
        if any(d.ndim != 1 for d in den):
            raise ValueError("ragged inputs must be sequences of 1-D utterances")
        if clean_speech is None:
            cln = [None] * len(den)
        else:
            cln = [_to_numpy(c).astype(np.float32) for c in clean_speech]
            if len(cln) != len(den) or any(
                c.shape != d.shape for c, d in zip(cln, den)
            ):
                raise ValueError(
                    "`clean_speech` and `denoised_speech` should have the "
                    "same per-utterance shapes."
                )

        groups: dict[int, list[int]] = {}
        for i, d in enumerate(den):
            groups.setdefault(d.shape[0], []).append(i)

        results: list[dict[str, float] | None] = [None] * len(den)
        for idxs in groups.values():
            d = np.stack([den[i] for i in idxs])
            c = (
                None
                if clean_speech is None
                else np.stack([cln[i] for i in idxs])
            )
            scores = self.compute(c, d)
            host = {k: np.asarray(v) for k, v in scores.items()}
            for row, i in enumerate(idxs):
                results[i] = {k: float(v[row]) for k, v in host.items()}
        return results  # type: ignore[return-value]
