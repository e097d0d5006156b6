"""Float64 torch-CPU DNSMOS oracle.

Functional re-implementation of the Microsoft DNSMOS ``sig_bak_ovr`` pipeline
using ``torch.nn.functional`` in float64 on CPU — an independent numerical
path (NCHW/cuDNN-style convs, sequential per-utterance loop) from the
package's NHWC/XLA implementation. Weights come from the same converted
``.npz`` the package uses, mapped back to torch layouts here.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from fast_speech_enhancement_metrics_tpu.models.dnsmos_net import DEFAULT_CHECKPOINT

WINDOW = 144160
HOP = 16000
POLY_C = np.array([0.0052439, -0.39604546, 0.04602535])
POLY_B1 = np.array([1.22083953, 1.60915514, 1.11546468])
POLY_B2 = np.array([-0.08397278, -0.13166888, -0.06766283])


def _torch_params():
    with np.load(str(DEFAULT_CHECKPOINT)) as data:
        p = {k: torch.tensor(v, dtype=torch.float64) for k, v in data.items()}
    return p


def _net_forward(p, windows: torch.Tensor) -> torch.Tensor:
    frames = windows.unfold(1, 320, 160)  # (N, F, 320)
    real = frames @ p["stft_real"]
    imag = frames @ p["stft_imag"]
    features = torch.log10((real.square() + imag.square()).clamp(min=1e-12))

    x = features.unsqueeze(1)  # NCHW (N, 1, F, 161)
    for n in range(7):
        w = p[f"conv{n}_w"].permute(3, 2, 0, 1)  # HWIO -> OIHW
        x = F.relu(F.conv2d(x, w, p[f"conv{n}_b"], padding=1))
        if n in (3, 4, 5):
            x = F.max_pool2d(x, 2, 2)
    pooled = x.amax(dim=(2, 3))  # (N, 64)

    h = F.relu(pooled @ p["dense0_w"] + p["dense0_b"])
    h = F.relu(h @ p["dense1_w"] + p["dense1_b"])
    return h @ p["dense2_w"] + p["dense2_b"]


def dnsmos_oracle(denoised: np.ndarray) -> dict[str, np.ndarray]:
    """(B, T) float audio at 16 kHz -> dict of (B,) SIG/BAK/OVRL arrays."""
    p = _torch_params()
    out = {"SIG": [], "BAK": [], "OVRL": []}
    for utt in np.atleast_2d(denoised):
        audio = torch.tensor(utt, dtype=torch.float64)
        while audio.shape[0] < WINDOW:
            audio = torch.cat([audio, audio])
        windows = audio.unfold(0, WINDOW, HOP)
        raw = _net_forward(p, windows).numpy()
        cal = POLY_C + POLY_B1 * raw + POLY_B2 * raw**2
        sig, bak, ovr = cal.mean(axis=0)
        out["SIG"].append(sig)
        out["BAK"].append(bak)
        out["OVRL"].append(ovr)
    return {k: np.array(v) for k, v in out.items()}
