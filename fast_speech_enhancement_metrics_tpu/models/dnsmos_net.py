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
    frames = frame(audio, 320, 160)  # (N, F, 320)

    real = jnp.einsum(
        "nfk,kr->nfr", frames, params["stft_real"], precision="highest"
    )
    imag = jnp.einsum(
        "nfk,kr->nfr", frames, params["stft_imag"], precision="highest"
    )
    power = jnp.square(real) + jnp.square(imag)
    features = jnp.log10(jnp.maximum(power, 1e-12))

    x = features[..., None]  # NHWC: (N, time, 161, 1)
    if conv_dtype is not None:
        x = x.astype(conv_dtype)
    for n in range(len(CONV_CHANNELS)):
        w = params[f"conv{n}_w"]
        x = lax.conv_general_dilated(
            x,
            w if conv_dtype is None else w.astype(conv_dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # TPU MXU default truncates conv inputs to bf16 (~1e-2 activation
            # error after 7 layers); HIGHEST keeps fp32-equivalent accuracy
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        x = jnp.maximum(x + params[f"conv{n}_b"], 0.0)
        if conv_dtype is not None:
            x = x.astype(conv_dtype)  # fused into the conv epilogue by XLA
        if n in POOL_AFTER:
            x = _max_pool_2x2(x)

    pooled = jnp.max(x, axis=(1, 2)).astype(jnp.float32)  # global max -> (N, 64)

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
