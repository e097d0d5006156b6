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


@functools.lru_cache(maxsize=None)
def _block_resample_matrix(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int, int, int, int]:
    """Fold ``bs`` polyphase frames into one MXU-sized block matrix.

    The naive polyphase form is a (frames, K) x (K, phases) matmul with a
    skinny K (e.g. 28 for 16 kHz -> 10 kHz) that wastes the systolic array
    and materializes a K-times-blown-up frame tensor. Instead, process
    ``bs*orig`` input samples -> ``bs*new`` output samples per block with
    one (n_sub*in_blk, out_blk) matrix: M[i, q] = kernel[q % new, i - orig*(q
    // new)]. Applied as ``n_sub`` matmuls on shifted views of the zero-copy
    block reshape — no frame materialization at all.
    """
    kernel, width, orig, new = sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    k = kernel.shape[1]
    bs = max(1, -(-128 // orig))  # input block >= 128 samples
    in_blk = bs * orig
    out_blk = bs * new
    span = orig * (bs - 1) + k  # input samples touched by one output block
    n_sub = -(-span // in_blk)
    m = np.zeros((n_sub * in_blk, out_blk), np.float64)
    for q in range(out_blk):
        p, f = q % new, q // new
        m[orig * f : orig * f + k, q] = kernel[p]
    return m.astype(np.float32), width, orig, new, bs, k


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    precision: str = "highest",
    **kw,
) -> jnp.ndarray:
    """Resample (..., T) from orig_freq to new_freq. No-op if rates match.

    ``precision`` feeds the block matmuls: "highest" is fp32-exact; "high"
    (bf16x3, ~1e-6 relative) halves MXU passes for metrics whose agreement
    contract has the headroom (STOI's abs 5e-4)."""
    if orig_freq == new_freq:
        return x
    m, width, orig, new, bs, k = _block_resample_matrix(orig_freq, new_freq, **kw)
    t = x.shape[-1]
    target_length = -(-new * t // orig)  # ceil

    in_blk, out_blk = bs * orig, bs * new
    n_sub = m.shape[0] // in_blk
    # frame count matches the classic polyphase form (pad width left,
    # width + orig right); blocks round up so every shifted chunk view exists
    f_total = 1 + (t + 2 * width + orig - k) // orig
    c_blocks = -(-f_total // bs)
    need = (c_blocks + n_sub - 1) * in_blk
    pad = [(0, 0)] * (x.ndim - 1) + [(width, need - t - width)]
    xp = jnp.pad(x, pad)
    chunks = xp.reshape(x.shape[:-1] + (c_blocks + n_sub - 1, in_blk))

    out = None
    for s in range(n_sub):
        part = chunks[..., s : s + c_blocks, :]
        ms = jnp.asarray(m[s * in_blk : (s + 1) * in_blk], dtype=x.dtype)
        o_s = jnp.einsum("...ci,iq->...cq", part, ms, precision=precision)
        out = o_s if out is None else out + o_s
    out = out.reshape(x.shape[:-1] + (c_blocks * out_blk,))
    return out[..., :target_length]
