"""Multi-Resolution (STFT) Discriminator, TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/discriminators/
mrd.py:7-102: per resolution, a reflect-padded center=False magnitude STFT
(mrd.py:52-73) imaged as (freq, frames), then 5 weight-normed Conv2d + SiLU,
a post conv, and a flattened score.  The reference CONCATENATES per-resolution
scores along dim 1 (mrd.py:100) while MPD returns a list — quirk Q3; the loss
loop then iterates batch rows for MRD.  We mirror that exactly: `apply`
returns the concatenated (B, sum_D) score array, and the loss helpers treat an
array's rows as the iteration items, reproducing the reference's relative
weighting of the two ensembles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vocoder_tpu import nn
from vocoder_tpu.convert import conv2d_from_torch
from vocoder_tpu.ops import stft_magnitude


@dataclasses.dataclass(frozen=True)
class MRDConfig:
    # (n_fft, hop_length, win_length); configs/model/gan.yaml:46-53
    resolutions: tuple = ((2048, 512, 2048), (1024, 120, 600), (2048, 240, 1200), (4096, 480, 2400), (512, 50, 240))


def _disc_r_init(key, _cfg: MRDConfig) -> dict:
    keys = jax.random.split(key, 6)
    convs = [
        nn.conv2d_init(keys[0], 1, 32, (3, 9), weight_norm=True),
        nn.conv2d_init(keys[1], 32, 32, (3, 9), weight_norm=True),
        nn.conv2d_init(keys[2], 32, 32, (3, 9), weight_norm=True),
        nn.conv2d_init(keys[3], 32, 32, (3, 9), weight_norm=True),
        nn.conv2d_init(keys[4], 32, 32, (3, 3), weight_norm=True),
    ]
    post = nn.conv2d_init(keys[5], 32, 1, (3, 3), weight_norm=True)
    return {"convs": convs, "post": post}


def _disc_r_apply(p: dict, audio: jnp.ndarray, res: tuple):
    """audio: (B, T) -> (score (B, D), fmaps)."""
    n_fft, hop, win = res
    # NB: the reference calls torch.stft WITHOUT a window here (mrd.py:62-69),
    # i.e. a rectangular window — mirrored via window="boxcar".
    mag = stft_magnitude(
        audio, n_fft=n_fft, hop_length=hop, win_length=win, padding="same_nfft", mag_mode="plain", window="boxcar"
    )  # (B, F, TT)
    x = mag[..., None]  # NHWC with H=freq, W=frames
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [(1, 4), (1, 4), (1, 4), (1, 4), (1, 1)]
    for conv, s, pd in zip(p["convs"], strides, pads):
        x = nn.conv2d(conv, x, stride=s, padding=pd)
        x = nn.silu(x)
        fmap.append(x)
    x = nn.conv2d(p["post"], x, padding=(1, 1))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def init(key, cfg: MRDConfig) -> dict:
    keys = jax.random.split(key, len(cfg.resolutions))
    return {"discs": [_disc_r_init(k, cfg) for k in keys]}


def apply(params: dict, audio: jnp.ndarray, cfg: MRDConfig):
    """audio: (B, 1, T) -> (scores (B, sum_D) concatenated, list[list[fmap]])."""
    x = audio[:, 0, :]  # (B, T)
    scores, fmaps = [], []
    for p, res in zip(params["discs"], cfg.resolutions):
        s, f = _disc_r_apply(p, x, res)
        scores.append(s)
        fmaps.append(f)
    return jnp.concatenate(scores, axis=1), fmaps


def from_torch_state_dict(sd: dict, cfg: MRDConfig, prefix: str = "") -> dict:
    discs = []
    for i in range(len(cfg.resolutions)):
        dp = f"{prefix}discriminators.{i}"
        discs.append(
            {
                "convs": [conv2d_from_torch(sd, f"{dp}.convs.{j}") for j in range(5)],
                "post": conv2d_from_torch(sd, f"{dp}.conv_post"),
            }
        )
    return jax.tree.map(jnp.asarray, {"discs": discs})
