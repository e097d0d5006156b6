"""fast_speech_enhancement_metrics_tpu — TPU-native batched speech-enhancement metrics.

A brand-new JAX/XLA/Pallas framework with the capabilities of
kcoost/fast_speech_enhancement_metrics (``fast_se_metrics``): six batched
speech-quality metrics — PESQ, STOI/ESTOI, SDR, LSD, DNSMOS and
SpeechBERTScore — re-designed TPU-first:

* pure functional metric kernels, jitted once per input shape,
* static shapes + masks everywhere (no data-dependent control flow under jit),
* IIR filtering via truncated-impulse FFT convolution instead of sequential
  scans, filterbanks as MXU matmuls,
* batch sharding over a ``data`` mesh axis and tensor-parallel model sharding
  over a ``model`` mesh axis for multi-chip / multi-host scale-out.

Public API parity: each metric class is callable as
``metric(clean, denoised) -> list[dict[str, float]]`` like the reference
(`/root/reference/fast_se_metrics/__init__.py:1-15`).
"""

from fast_speech_enhancement_metrics_tpu.base import BaseMetric
from fast_speech_enhancement_metrics_tpu.metrics.lsd import LSD
from fast_speech_enhancement_metrics_tpu.metrics.sdr import SDR
from fast_speech_enhancement_metrics_tpu.metrics.stoi import STOI
from fast_speech_enhancement_metrics_tpu.metrics.pesq import PESQ
from fast_speech_enhancement_metrics_tpu.metrics.dnsmos import DNSMOS
from fast_speech_enhancement_metrics_tpu.metrics.speechbertscore import SpeechBERTScore

__version__ = "0.1.0"

__all__ = [
    "BaseMetric",
    "PESQ",
    "STOI",
    "SDR",
    "LSD",
    "DNSMOS",
    "SpeechBERTScore",
]
