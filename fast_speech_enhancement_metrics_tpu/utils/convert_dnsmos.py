"""One-shot converter: DNSMOS torch checkpoint -> JAX-layout ``.npz``.

The DNSMOS weights originate from Microsoft's DNS-Challenge ONNX release
(``sig_bak_ovr.onnx``); the reference bundles them as a torch state dict
(reference: fast_se_metrics/utils/download_dnsmos_model.py:14-58 documents the
ONNX->torch mapping, reference: fast_se_metrics/checkpoints/SIG_BAK_OVR.pt).
This tool maps the 22 tensors into the layouts the TPU model consumes
natively:

* learned-STFT 1x1 Conv1d ``(161, 320, 1)`` -> dense ``(320, 161)`` matmul
  weights (the conv *is* a matmul over the frame axis),
* Conv2d ``OIHW`` -> ``HWIO`` (XLA's TPU-native kernel layout),
* Linear ``(out, in)`` -> ``(in, out)``.

Usage::

    python -m fast_speech_enhancement_metrics_tpu.utils.convert_dnsmos \
        <SIG_BAK_OVR.pt> <output.npz>
"""

from __future__ import annotations

import sys

import numpy as np

#: torch Sequential indices of the 7 conv / 3 dense layers in the state dict
CONV_INDICES = (0, 2, 4, 6, 9, 12, 15)
DENSE_INDICES = (0, 2, 4)


def convert_state_dict(state_dict) -> dict[str, np.ndarray]:
    """Map a torch DNSMOS state dict to the JAX parameter layout."""

    def to_np(t):
        return np.ascontiguousarray(t.detach().cpu().numpy().astype(np.float32))

    params: dict[str, np.ndarray] = {
        # (161, 320, 1) conv1d -> (320, 161) matmul
        "stft_real": to_np(state_dict["conv_real_stft.weight"])[:, :, 0].T,
        "stft_imag": to_np(state_dict["conv_imag_stft.weight"])[:, :, 0].T,
    }
    for n, idx in enumerate(CONV_INDICES):
        w = to_np(state_dict[f"conv_layers.{idx}.weight"])  # (O, I, H, W)
        params[f"conv{n}_w"] = w.transpose(2, 3, 1, 0)  # -> HWIO
        params[f"conv{n}_b"] = to_np(state_dict[f"conv_layers.{idx}.bias"])
    for n, idx in enumerate(DENSE_INDICES):
        w = to_np(state_dict[f"output_layers.{idx}.weight"])  # (out, in)
        params[f"dense{n}_w"] = w.T
        params[f"dense{n}_b"] = to_np(state_dict[f"output_layers.{idx}.bias"])
    return params


def main(src: str, dst: str) -> None:
    import torch

    state_dict = torch.load(src, map_location="cpu", weights_only=True)
    params = convert_state_dict(state_dict)
    np.savez(dst, **params)
    total = sum(v.size for v in params.values())
    print(f"wrote {dst}: {len(params)} tensors, {total} parameters")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
