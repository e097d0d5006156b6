"""DNSMOS P.835 network as a pure JAX function, TPU-native.

Architecture contract (Microsoft DNS-Challenge ``sig_bak_ovr.onnx``; the
reference re-expresses it as an nn.Module at fast_se_metrics/DNSMOS.py:10-83):
a learned 320-point STFT (two 1x1 convolutions producing real/imag at 161
bins), log power spectrum, a 7-layer 3x3 CNN with three 2x2 max-pools, global
max over all (time, freq) positions, and a 3-layer MLP emitting raw
SIG/BAK/OVR.

TPU design: NHWC activations + HWIO kernels (XLA's native TPU conv layout,
vs. the reference's NCHW/cuDNN), the learned STFT as one framing plus two
(frames, 320) x (320, 161) MXU matmuls, and max-pool via
``lax.reduce_window``. Parameters are a flat dict pytree loaded from the
converted ``.npz`` (see utils/convert_dnsmos.py).
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from jax import lax

from fast_speech_enhancement_metrics_tpu.ops.stft import frame

DEFAULT_CHECKPOINT = (
    Path(__file__).parent.parent / "checkpoints" / "dnsmos_sig_bak_ovr.npz"
)

#: channel widths of the 7 conv layers
CONV_CHANNELS = (128, 64, 64, 32, 32, 32, 64)
#: conv layer indices followed by a 2x2 max-pool
POOL_AFTER = frozenset({3, 4, 5})


@functools.lru_cache(maxsize=None)
def _load_arrays(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as data:
        return dict(data)


def load_params(path: str | Path = DEFAULT_CHECKPOINT, dtype=jnp.float32):
    """Load converted DNSMOS weights as a jnp pytree."""
    return {k: jnp.asarray(v, dtype=dtype) for k, v in _load_arrays(str(path)).items()}


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool over the (H, W) axes of NHWC, floor (VALID) semantics."""
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    return lax.reduce_window(
        x[:, :h, :w, :],
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _log_power_features(params, audio, precision):
    """(N, T) -> (N, frames, 161) log power via the learned STFT."""
    frames = frame(audio, 320, 160)
    real = jnp.einsum("nfk,kr->nfr", frames, params["stft_real"], precision=precision)
    imag = jnp.einsum("nfk,kr->nfr", frames, params["stft_imag"], precision=precision)
    power = jnp.square(real) + jnp.square(imag)
    return jnp.log10(jnp.maximum(power, 1e-12))


def _conv_layer(params, x, n, precision):
    in_dtype = x.dtype  # conv output is fp32 (preferred_element_type); keep
    # the activation stream in the caller's dtype so bf16 mode stays bf16
    x = lax.conv_general_dilated(
        x,
        params[f"conv{n}_w"].astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # TPU MXU default truncates conv inputs to bf16 (~1e-2 activation
        # error after 7 layers); HIGHEST keeps fp32-equivalent accuracy
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(x + params[f"conv{n}_b"], 0.0).astype(in_dtype)


def _output_mlp(params, pooled):
    # the MLP's error lands directly on the scores and its FLOPs are
    # negligible — always run it at fp32-equivalent precision
    def dense(h, n):
        return (
            jnp.matmul(h, params[f"dense{n}_w"], precision=lax.Precision.HIGHEST)
            + params[f"dense{n}_b"]
        )

    h = jnp.maximum(dense(pooled, 0), 0.0)
    h = jnp.maximum(dense(h, 1), 0.0)
    return dense(h, 2)


def dnsmos_net_shared(
    params: dict,
    audio: jnp.ndarray,
    num_windows: int,
    frames_per_hop: int = 100,
    precision=lax.Precision.HIGHEST,
    conv_dtype=None,
) -> jnp.ndarray:
    """Shared-conv evaluation of all 9.01 s windows of (B, T) audio at once.

    Exact windowed DNSMOS recomputes the conv stack on every window although
    consecutive windows overlap 8.01 s of 9.01 s (the 1 s hop is exactly 100
    STFT frames, so window k's frames are the full signal's frames
    [100k, 100k+900) — identical content). This mode runs convs 1–6 and the
    first two max-pools ONCE over the full signal; only the third time-pool
    needs two phases, because the window offset in its input grid is
    100/4 = 25 (odd). Window k then reads 112 pooled cells starting at
    (100k - (100k mod 8)) / 8 from the matching phase, global-maxes, and
    goes through the MLP — ~(900·S)/(100·S+800) ≈ 4–9× fewer conv FLOPs.

    Deviation vs the exact mode comes only from window-boundary context: the
    exact mode zero-pads each window's conv inputs, this mode sees the real
    neighboring audio (receptive field ≈ ±18 of 900 frames per edge),
    entering the scores only when the global max sits near a boundary.
    """
    if frames_per_hop % 4 != 0:
        raise ValueError(
            "shared-conv mode needs the hop to be a multiple of 4 STFT frames "
            "(two pool-grid phases); got frames_per_hop="
            f"{frames_per_hop}"
        )
    feats = _log_power_features(params, audio, "highest")
    x = feats[..., None]
    if conv_dtype is not None:
        x = x.astype(conv_dtype)

    for n in range(4):
        x = _conv_layer(params, x, n, precision)
    x = _max_pool_2x2(x)
    x = _conv_layer(params, x, 4, precision)
    x = _max_pool_2x2(x)
    x = _conv_layer(params, x, 5, precision)  # (B, T6, 40, 32)

    phases = []
    for phase in (0, 1):
        xp = x if phase == 0 else x[:, 1:, :, :]
        xp = _max_pool_2x2(xp)
        phases.append(_conv_layer(params, xp, 6, precision))  # (B, Tp, 20, 64)

    window_cells = 900 // 8  # 112 pooled cells per 9.01 s window
    pooled = []
    for k in range(num_windows):
        start_frame = k * frames_per_hop
        phase = (start_frame % 8) // 4
        j0 = (start_frame - start_frame % 8) // 8
        cells = phases[phase][:, j0 : j0 + window_cells]
        pooled.append(jnp.max(cells, axis=(1, 2)))
    pooled = jnp.stack(pooled, axis=1).astype(jnp.float32)  # (B, S, 64)

    return _output_mlp(params, pooled)


def dnsmos_net(
    params: dict,
    audio: jnp.ndarray,
    precision=lax.Precision.HIGHEST,
    conv_dtype=None,
) -> jnp.ndarray:
    """(N, 144160) audio windows at 16 kHz -> (N, 3) raw SIG/BAK/OVR.

    ``conv_dtype=jnp.bfloat16`` stores conv activations in bf16 (halving the
    HBM traffic of the stack, the throughput bottleneck) while accumulating
    in fp32; the learned STFT, global pooling and output MLP stay fp32.
    """
    x = _log_power_features(params, audio, "highest")[..., None]  # NHWC
    if conv_dtype is not None:
        x = x.astype(conv_dtype)
    for n in range(len(CONV_CHANNELS)):
        x = _conv_layer(params, x, n, precision)
        if n in POOL_AFTER:
            x = _max_pool_2x2(x)

    pooled = jnp.max(x, axis=(1, 2)).astype(jnp.float32)  # global max -> (N, 64)
    return _output_mlp(params, pooled)
