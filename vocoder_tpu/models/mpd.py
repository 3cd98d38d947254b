"""Multi-Period Discriminator (UnivNet/HiFiGAN-style), TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/discriminators/
mpd.py:9-88: per period p, zero-pad the waveform to a multiple of p, fold time
into a (T/p, p) image, then 5 weight-normed (k x 1) convs with stride (3, 1)
and SiLU, a post conv, and a flattened score.  GAN config uses primes
[3,5,7,11,17,23,37] (configs/model/gan.yaml:44).

Layout is NHWC (torch uses NCHW); scores/feature-maps feed only
permutation-invariant mean/L1 losses, so parity is checked at the loss level.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vocoder_tpu import nn
from vocoder_tpu.convert import conv2d_from_torch


@dataclasses.dataclass(frozen=True)
class MPDConfig:
    periods: tuple = (2, 3, 5, 7, 11)
    kernel_size: int = 5
    stride: int = 3
    channels: tuple = (1, 64, 128, 256, 512, 1024)


def _disc_p_init(key, cfg: MPDConfig) -> dict:
    chs = cfg.channels
    keys = jax.random.split(key, len(chs))
    convs = [
        nn.conv2d_init(keys[i], chs[i], chs[i + 1], (cfg.kernel_size, 1), weight_norm=True)
        for i in range(len(chs) - 1)
    ]
    post = nn.conv2d_init(keys[-1], chs[-1], 1, (3, 1), weight_norm=True)
    return {"convs": convs, "post": post}


def _disc_p_apply(p: dict, x: jnp.ndarray, period: int, cfg: MPDConfig):
    """x: (B, T, 1) -> (score (B, D), fmaps)."""
    b, t, c = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        t = t + n_pad
    x = x.reshape(b, t // period, period, c)  # NHWC

    fmap = []
    for conv in p["convs"]:
        x = nn.conv2d(conv, x, stride=(cfg.stride, 1), padding=(cfg.kernel_size // 2, 0))
        x = nn.silu(x)
        fmap.append(x)
    x = nn.conv2d(p["post"], x, padding=(1, 0))
    fmap.append(x)
    return x.reshape(b, -1), fmap


def init(key, cfg: MPDConfig) -> dict:
    keys = jax.random.split(key, len(cfg.periods))
    return {"discs": [_disc_p_init(k, cfg) for k in keys]}


def apply(params: dict, audio: jnp.ndarray, cfg: MPDConfig):
    """audio: (B, 1, T) -> (list[scores (B, D_p)], list[list[fmap]])."""
    x = jnp.transpose(audio, (0, 2, 1))  # (B, T, 1)
    scores, fmaps = [], []
    for p, period in zip(params["discs"], cfg.periods):
        s, f = _disc_p_apply(p, x, period, cfg)
        scores.append(s)
        fmaps.append(f)
    return scores, fmaps


def from_torch_state_dict(sd: dict, cfg: MPDConfig, prefix: str = "") -> dict:
    discs = []
    for i in range(len(cfg.periods)):
        dp = f"{prefix}discriminators.{i}"
        discs.append(
            {
                "convs": [
                    conv2d_from_torch(sd, f"{dp}.convs.{j}") for j in range(len(cfg.channels) - 1)
                ],
                "post": conv2d_from_torch(sd, f"{dp}.conv_post"),
            }
        )
    return jax.tree.map(jnp.asarray, {"discs": discs})
