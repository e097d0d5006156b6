"""DNSMOS (non-intrusive SIG/BAK/OVRL MOS), TPU-native.

Behavioral contract (reference: fast_se_metrics/DNSMOS.py:86-136, matching
Microsoft's DNS-Challenge ``sig_bak_ovr.onnx`` pipeline with its segmentation
bug fixed to exact 1 s hops):

* repeat-double the utterance until it reaches 9.01 s,
* slide 9.01 s windows at 1 s hop,
* run the DNSMOS net on every window, apply the per-dimension polynomial
  calibration ``c + b1*x + b2*x^2``, average over windows.

Precision: the reference runs this net under fp16 autocast (its published
GPU deviation is 6e-3 — fast_se_metrics/DNSMOS.py:120); ``precision=
"default"`` is the TPU analogue (bf16 MXU passes, ~8e-3 score deviation,
~4x faster). Pass ``precision="highest"`` for fp32-exact scores (~3e-4).

TPU design: the reference loops over utterances in Python ("batching doesn't
result in any significant speedup" on GPU — fast_se_metrics/DNSMOS.py:111);
here all utterances' windows fold into ONE batched net invocation
(B*S, 144160) so the conv stack sees a single large NHWC batch on the MXU.
The repeat-pad while-loop becomes a static tile count derived from the input
shape (power-of-two doubling, exactly like the reference's ``cat(audio,
audio)`` loop).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.base import BaseMetric
from fast_speech_enhancement_metrics_tpu.models.dnsmos_net import (
    DEFAULT_CHECKPOINT,
    dnsmos_net,
    dnsmos_net_shared,
    dnsmos_net_windowed_exact,
    load_params,
)
from fast_speech_enhancement_metrics_tpu.ops.stft import frame

INPUT_LENGTH_S = 9.01

#: polynomial MOS calibration (SIG, BAK, OVR) from Microsoft's DNSMOS release
POLY_C = np.array([0.0052439, -0.39604546, 0.04602535], dtype=np.float32)
POLY_B1 = np.array([1.22083953, 1.60915514, 1.11546468], dtype=np.float32)
POLY_B2 = np.array([-0.08397278, -0.13166888, -0.06766283], dtype=np.float32)


class DNSMOS(BaseMetric):
    higher_is_better = True
    EXPECTED_SAMPLING_RATE = 16000
    NON_INTRUSIVE = True

    def __init__(
        self,
        sample_rate: int = 16000,
        checkpoint=DEFAULT_CHECKPOINT,
        segment_chunk: int | None = None,
        precision: str | None = "default",
        conv_dtype=None,
        conv_pack: str | tuple | None = None,
        host_chunk: int | None = None,
        shared_conv: bool = False,
        window_plan: str = "shared_exact",
        **kw,
    ):
        super().__init__(sample_rate, **kw)
        self.window = int(INPUT_LENGTH_S * self.EXPECTED_SAMPLING_RATE)  # 144160
        self.hop = self.EXPECTED_SAMPLING_RATE
        #: conv activations are ~0.5 GB per window at fp32; chunking the
        #: (B*S) window axis caps peak HBM for large batches
        self.segment_chunk = segment_chunk
        self.precision = precision
        #: e.g. jnp.bfloat16: bf16 conv activations (fp32 accumulate) — halves
        #: the conv stack's HBM traffic
        self.conv_dtype = conv_dtype
        #: width-packed conv weights ("mxu" = MXU_CONV_PACK): packs adjacent
        #: frequency positions into the channel axis to raise MXU lane
        #: utilization at identical math. Measured 2.1x SLOWER end-to-end
        #: (96.5 -> 202 ms/eval at batch 64, tools/prof_dnsmos_pack.py):
        #: XLA's TPU conv emitter already schedules the channel-starved
        #: layers better than the padded-FLOP trade. Default None; the
        #: option and the probe stay as the recorded negative A/B.
        if conv_pack == "mxu":
            from fast_speech_enhancement_metrics_tpu.models.dnsmos_net import (
                MXU_CONV_PACK,
            )

            conv_pack = MXU_CONV_PACK
        elif conv_pack == "winograd":
            # F(2x2, 3x3) on convs 1-6 (2.25x fewer matmul MACs; conv0's
            # C_in = 1 makes its per-position matmul degenerate, keep direct)
            conv_pack = (1, "w", "w", "w", "w", "w", "w")
        elif isinstance(conv_pack, str):
            raise ValueError(
                f"unknown conv_pack: {conv_pack!r} "
                "(use 'mxu', 'winograd', a per-layer tuple, or None)"
            )
        self.conv_pack = conv_pack
        #: like segment_chunk, but the chunk loop runs in Python over ONE
        #: jitted per-chunk net graph instead of a lax.map inside the metric
        #: graph — same results and throughput, a fraction of the compile
        #: cost (useful where XLA compiles are expensive). Single-device only.
        #: shared-conv APPROXIMATE path: conv stack once over the full signal,
        #: windows slice the shared map (~4-9x fewer FLOPs; boundary-context
        #: deviation ~0.05-0.1 MOS — see models/dnsmos_net.py::
        #: dnsmos_net_shared and results/dnsmos_deviation.md). Requires
        #: host_chunk. Overrides window_plan.
        self.shared_conv = shared_conv
        #: "shared_exact" (default): shared conv trunk + per-window edge
        #: strips — same scores as per-window evaluation up to float
        #: reassociation (bit-exact at fp32 on CPU), ~2.9x fewer conv FLOPs.
        #: "per_window": the reference's literal plan, every window through
        #: the full stack (models/dnsmos_net.py::dnsmos_net_windowed_exact).
        if window_plan not in ("shared_exact", "per_window"):
            raise ValueError(f"unknown window_plan: {window_plan!r}")
        self.window_plan = window_plan
        self.host_chunk = host_chunk
        #: HBM cap (GB) for the shared_exact trunk's conv0 feature map;
        #: larger batches split into equal row chunks under a lax.map
        self.shared_chunk_gb = 6.0
        if shared_conv and host_chunk is None:
            raise ValueError("shared_conv requires host_chunk (utterances per step)")
        if host_chunk is not None:
            if self.mesh is not None:
                raise ValueError(
                    "host_chunk is a single-device execution plan; use "
                    "segment_chunk with a mesh"
                )
            import jax

            self._net_jitted = jax.jit(
                lambda w: dnsmos_net(
                    self.params, w, self.precision, self.conv_dtype, self.conv_pack
                )
            )
            self._segment_jitted = jax.jit(self._segment)
        self.params = load_params(checkpoint, dtype=self.dtype)
        if self.mesh is not None:  # tiny net: replicate across the mesh
            import jax

            from fast_speech_enhancement_metrics_tpu.parallel.sharding import replicated

            sharding = replicated(self.mesh)
            self.params = jax.tree.map(
                lambda a: jax.device_put(a, sharding), self.params
            )

    def _segment(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, S, window): repeat-double to >= 9.01 s, then unfold."""
        t = audio.shape[1]
        if t < self.window:
            # the reference doubles in a while-loop -> power-of-two tiling
            reps = 1
            while t * reps < self.window:
                reps *= 2
            audio = jnp.tile(audio, (1, reps))
        return frame(audio, self.window, self.hop)

    def _tile_to_window(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Repeat-double (B, T) audio until T >= 9.01 s (reference's
        while-loop as a static power-of-two tile count)."""
        t = audio.shape[1]
        reps = 1
        while t * reps < self.window:
            reps *= 2
        return jnp.tile(audio, (1, reps)) if reps > 1 else audio

    def _run_shared(self, denoised, net_fn):
        """Shared-conv-trunk plan (exact or approximate ``net_fn``):
        (B, T) -> scores; utterance-chunked host loop over one jitted graph."""
        import jax
        import numpy as np

        denoised = self._tile_to_window(denoised)

        key = f"_shared_jitted_{net_fn.__name__}"
        if not hasattr(self, key):

            def shared_fn(audio):
                num_windows = (audio.shape[1] - self.window) // self.hop + 1
                return net_fn(
                    self.params,
                    audio,
                    num_windows,
                    self.hop // 160,
                    self.precision,
                    self.conv_dtype,
                    self.conv_pack,
                )

            setattr(self, key, jax.jit(shared_fn))

        batch, chunk = denoised.shape[0], self.host_chunk
        pad = (-batch) % chunk
        if pad:  # tile rows so any chunk > 2B still pads to a chunk multiple
            reps = -(-pad // batch)
            denoised = jnp.concatenate([denoised] + [denoised] * reps, axis=0)[
                : batch + pad
            ]
        raw = jnp.concatenate(
            [
                getattr(self, key)(denoised[i : i + chunk])
                for i in range(0, denoised.shape[0], chunk)
            ],
            axis=0,
        )[:batch]  # (B, S, 3)
        raw = np.asarray(jax.block_until_ready(raw), dtype=np.float64)
        calibrated = POLY_C + POLY_B1 * raw + POLY_B2 * raw**2
        scores = calibrated.mean(axis=1)
        return {
            "SIG": scores[:, 0].astype(np.float32),
            "BAK": scores[:, 1].astype(np.float32),
            "OVRL": scores[:, 2].astype(np.float32),
        }

    def _run_prepared(self, clean, denoised):
        if self.host_chunk is None:
            return super()._run_prepared(clean, denoised)
        import jax
        import numpy as np

        if self.sample_rate != self.EXPECTED_SAMPLING_RATE:
            from fast_speech_enhancement_metrics_tpu.ops.resample import resample

            denoised = resample(
                denoised, self.sample_rate, self.EXPECTED_SAMPLING_RATE
            )
        if self.shared_conv:
            return self._run_shared(denoised, dnsmos_net_shared)
        if self.window_plan == "shared_exact":
            return self._run_shared(denoised, dnsmos_net_windowed_exact)
        segments = self._segment_jitted(denoised)
        batch, num_segments = segments.shape[:2]
        windows = segments.reshape(-1, self.window)
        chunk = self.host_chunk
        pad = (-windows.shape[0]) % chunk
        if pad:  # tile rows so any chunk > 2N still pads to a chunk multiple
            reps = -(-pad // windows.shape[0])
            windows = jnp.concatenate([windows] + [windows] * reps, axis=0)[
                : windows.shape[0] + pad
            ]
        raw = jnp.concatenate(
            [
                self._net_jitted(windows[i : i + chunk])
                for i in range(0, windows.shape[0], chunk)
            ],
            axis=0,
        )[: batch * num_segments]
        raw = np.asarray(jax.block_until_ready(raw), dtype=np.float64)
        calibrated = POLY_C + POLY_B1 * raw + POLY_B2 * raw**2
        scores = calibrated.reshape(batch, num_segments, 3).mean(axis=1)
        return {
            "SIG": scores[:, 0].astype(np.float32),
            "BAK": scores[:, 1].astype(np.float32),
            "OVRL": scores[:, 2].astype(np.float32),
        }

    def _compute(self, clean, denoised):
        del clean  # non-intrusive
        batch = denoised.shape[0]
        if self.window_plan == "shared_exact":
            audio = self._tile_to_window(denoised)
            num_windows = (audio.shape[1] - self.window) // self.hop + 1

            def net(a):
                return dnsmos_net_windowed_exact(
                    self.params,
                    a,
                    num_windows,
                    self.hop // 160,
                    self.precision,
                    self.conv_dtype,
                    self.conv_pack,
                )

            # auto-chunk the utterance axis: the trunk's conv0 feature map is
            # (B, frames, 161, 128) — ~8.4 GB at batch 128 x 16 s in bf16 —
            # so large batches split into the fewest equal row chunks that
            # keep it under ~6 GB (identical scores; chunk exactness
            # asserted in tests/test_dnsmos.py)
            bytes_per = (
                jnp.dtype(self.conv_dtype).itemsize
                if self.conv_dtype is not None
                else 4
            )
            frames = audio.shape[1] // 160 - 1
            fm_gb = batch * frames * 161 * 128 * bytes_per / 1e9
            chunk = None
            cap = self.shared_chunk_gb
            if fm_gb > cap and batch > 1:
                n_chunks = int(-(-fm_gb // cap))
                per_chunk = max(1, -(-batch // n_chunks))
                # 8-row alignment only when the batch affords it (long-audio
                # small batches still need per-row chunking to stay in HBM).
                # Round DOWN to the sublane multiple: rounding up let a
                # chunk carry ~1.8x the shared_chunk_gb cap near batch
                # boundaries (e.g. batch 17 -> per_chunk 9 -> chunk 16),
                # defeating the HBM guard the chunking exists for
                aligned = per_chunk // 8 * 8
                chunk = aligned if (batch >= 16 and aligned >= 8) else per_chunk
            if chunk is not None and batch > chunk:
                import jax

                pad = (-batch) % chunk
                if pad:
                    audio = jnp.concatenate([audio, audio[:pad]], axis=0)
                raw = jax.lax.map(
                    net, audio.reshape(-1, chunk, audio.shape[1])
                ).reshape(-1, num_windows, 3)[:batch].reshape(-1, 3)
            else:
                raw = net(audio).reshape(-1, 3)
            calibrated = (
                jnp.asarray(POLY_C)
                + jnp.asarray(POLY_B1) * raw
                + jnp.asarray(POLY_B2) * jnp.square(raw)
            )
            scores = calibrated.reshape(batch, num_windows, 3).mean(axis=1)
            return {"SIG": scores[:, 0], "BAK": scores[:, 1], "OVRL": scores[:, 2]}
        segments = self._segment(denoised)
        num_segments = segments.shape[1]

        windows = segments.reshape(-1, self.window)
        n = windows.shape[0]
        chunk = self.segment_chunk
        if chunk is not None and n > chunk:
            import jax

            pad = (-n) % chunk
            if pad:
                windows = jnp.concatenate([windows, windows[:pad]], axis=0)
            raw = jax.lax.map(
                lambda w: dnsmos_net(
                    self.params, w, self.precision, self.conv_dtype, self.conv_pack
                ),
                windows.reshape(-1, chunk, self.window),
            ).reshape(-1, 3)[:n]
        else:
            raw = dnsmos_net(
                self.params, windows, self.precision, self.conv_dtype, self.conv_pack
            )
        raw = raw.astype(jnp.float32)
        calibrated = (
            jnp.asarray(POLY_C)
            + jnp.asarray(POLY_B1) * raw
            + jnp.asarray(POLY_B2) * jnp.square(raw)
        )
        scores = calibrated.reshape(batch, num_segments, 3).mean(axis=1)
        return {"SIG": scores[:, 0], "BAK": scores[:, 1], "OVRL": scores[:, 2]}
