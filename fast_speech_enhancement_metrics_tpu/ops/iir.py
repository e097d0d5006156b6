"""IIR filtering as frequency-domain multiplication — the TPU-first design.

The reference applies two IIR filters with ``torchaudio.functional.lfilter``
(reference: fast_se_metrics/PESQ.py:94,111), an inherently *sequential*
recursion over ~256k samples that XLA cannot parallelize. On TPU we avoid the
recursion entirely: ``lfilter`` with zero initial state is exactly causal
convolution with the filter's (infinite) impulse response, so for any *stable*
filter we can

1. zero-pad the signal to ``n >= T + tail`` where ``tail`` covers the impulse
   response decay (``|p_max|^tail`` below fp32 resolution),
2. multiply its rFFT by the transfer function ``H = B(z)/A(z)`` evaluated on
   the DFT grid (computed once per (coeffs, n) in float64 on the host),
3. take the inverse rFFT and truncate back to ``T``.

The circular-convolution alias terms involve the impulse response at lags
``>= tail``; both PESQ filters have ``|p_max| <= 0.9727`` so a 8192-sample
tail leaves alias energy below 1e-90 — exact for all practical purposes, and
the whole filter is two large batched FFTs that run natively on TPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _freq_response(b: tuple, a: tuple, n: int) -> np.ndarray:
    """Transfer function B(z)/A(z) on the length-``n`` rFFT grid (float64)."""
    k = np.arange(n // 2 + 1)
    zinv = np.exp(-2j * np.pi * k / n)  # z^-1 on the unit circle
    num = np.zeros_like(zinv)
    den = np.zeros_like(zinv)
    for i, coeff in enumerate(b):
        num = num + coeff * zinv**i
    for i, coeff in enumerate(a):
        den = den + coeff * zinv**i
    return (num / den).astype(np.complex64)


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def lfilter_fft(
    x: jnp.ndarray,
    b: tuple | np.ndarray,
    a: tuple | np.ndarray,
    tail: int = 8192,
) -> jnp.ndarray:
    """Causal IIR filter of (..., T) with zero initial conditions.

    Matches ``scipy.signal.lfilter(b, a, x)`` / torchaudio ``lfilter`` to
    fp32 roundoff for stable filters whose impulse response decays within
    ``tail`` samples.
    """
    t = x.shape[-1]
    n = next_pow2(t + tail)
    h = jnp.asarray(_freq_response(tuple(np.asarray(b)), tuple(np.asarray(a)), n))
    spectrum = jnp.fft.rfft(x, n=n, axis=-1)
    y = jnp.fft.irfft(spectrum * h, n=n, axis=-1)
    return y[..., :t].astype(x.dtype)
