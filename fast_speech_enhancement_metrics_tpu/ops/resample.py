"""Polyphase windowed-sinc resampling as a single MXU matmul.

Re-derivation of the classic band-limited interpolation resampler (the same
algorithm torchaudio's ``Resample``/``sinc_interp_hann`` implements, which the
reference uses for rate conversion — reference: fast_se_metrics/base.py:13,19-20).
The kernel bank is built once in float64 on the host; on device the whole
resample is one framing + one (frames, K) x (K, phases) matmul, which XLA maps
straight onto the MXU — no strided conv, no Python loops.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from fast_speech_enhancement_metrics_tpu.ops.stft import frame


@functools.lru_cache(maxsize=None)
def sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int, int, int]:
    """Build the polyphase kernel bank.

    Returns (kernel[(phases, K)], width, orig_freq_reduced, new_freq_reduced).
    """
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd

    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))

    # time grid: one row per output phase, columns spanning the kernel support
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig
    phase = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new
    t = (phase + idx[None, :]) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float32), width, orig, new


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int, **kw) -> jnp.ndarray:
    """Resample (..., T) from orig_freq to new_freq. No-op if rates match."""
    if orig_freq == new_freq:
        return x
    kernel, width, orig, new = sinc_resample_kernel(orig_freq, new_freq, **kw)
    t = x.shape[-1]
    target_length = -(-new * t // orig)  # ceil

    pad = [(0, 0)] * (x.ndim - 1) + [(width, width + orig)]
    xp = jnp.pad(x, pad)
    k = kernel.shape[1]
    f = 1 + (xp.shape[-1] - k) // orig
    frames = frame(xp, k, orig)  # (..., F, K) — gather-free framing
    out = jnp.einsum(
        "...fk,pk->...fp",
        frames,
        jnp.asarray(kernel, dtype=x.dtype),
        precision="highest",
    )
    out = out.reshape(x.shape[:-1] + (f * new,))
    return out[..., :target_length]
