"""Torch-checkpoint -> vocoder_tpu parameter conversion.

Maps the reference's state_dict layouts (both weight-normed, i.e. with
``parametrizations.weight.original{0,1}`` entries, and folded post
remove_parametrizations) onto this framework's canonical layouts (see
vocoder_tpu/nn.py).  Used by the inference CLI and by the allclose parity
tests (BASELINE.md: "waveform parity vs reference at matched checkpoints").
"""

from __future__ import annotations

import numpy as np


def _np(x):
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def conv1d_from_torch(sd: dict, prefix: str) -> dict:
    """torch Conv1d (O, I/g, K) -> {"v"/"w": (K, I/g, O), "g": (1,1,O), "b"}."""
    p = {}
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])  # (O,1,1)
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])  # (O,I,K)
        p["g"] = g.reshape(1, 1, -1)
        p["v"] = v.transpose(2, 1, 0)
    elif f"{prefix}.weight_g" in sd:  # legacy torch.nn.utils.weight_norm naming
        p["g"] = _np(sd[f"{prefix}.weight_g"]).reshape(1, 1, -1)
        p["v"] = _np(sd[f"{prefix}.weight_v"]).transpose(2, 1, 0)
    else:
        p["w"] = _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def conv_transpose1d_from_torch(sd: dict, prefix: str) -> dict:
    """torch ConvTranspose1d (I, O, K) -> (K, I, O) with kernel time-flipped."""

    def conv(v):  # (I,O,K) -> (K,I,O), flipped
        return np.flip(v, axis=2).transpose(2, 0, 1).copy()

    p = {}
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])  # (I,1,1)
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])  # (I,O,K)
        p["g"] = g.reshape(1, -1, 1)
        p["v"] = conv(v)
    else:
        p["w"] = conv(_np(sd[f"{prefix}.weight"]))
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def conv2d_from_torch(sd: dict, prefix: str) -> dict:
    """torch Conv2d (O, I, kH, kW) -> (kH, kW, I, O)."""
    p = {}
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])  # (O,1,1,1)
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
        p["g"] = g.reshape(1, 1, 1, -1)
        p["v"] = v.transpose(2, 3, 1, 0)
    else:
        p["w"] = _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def linear_from_torch(sd: dict, prefix: str) -> dict:
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def layer_norm_from_torch(sd: dict, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
