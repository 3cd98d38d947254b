"""Multi-Period Discriminator (UnivNet/HiFiGAN-style), TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/discriminators/
mpd.py:9-88: per period p, zero-pad the waveform to a multiple of p, fold time
into a (T/p, p) image, then 5 weight-normed (k x 1) convs with stride (3, 1)
and SiLU, a post conv, and a flattened score.  GAN config uses primes
[3,5,7,11,17,23,37] (configs/model/gan.yaml:44).

Layout is NHWC (torch uses NCHW); scores/feature-maps feed only
permutation-invariant mean/L1 losses, so parity is checked at the loss level.

Backends (MPD_BACKEND):
  "image"  — the literal (B, T/p, p, C) NHWC conv2d stack.  On TPU the W=p
             axis sits in sublanes and is padded to a multiple of 8, wasting
             8/3 = 2.7x (p=3) .. 40/37 = 1.08x (p=37) of every conv in the
             stack.
  "folded" — the (k, 1) kernels never mix across the period axis, so each
             column is an independent 1-D signal: fold the period into the
             batch, (B, T/p, p, C) -> (B*p, T/p, C), and run the whole stack
             as dense stride-3 conv1ds.  Identical dot products with dense
             sublanes; scores are unfolded back to the image order (exact),
             fmaps stay folded (feature matching is elementwise-mean over
             identical element sets, so losses are unchanged).
  "auto"   — folded on TPU, image elsewhere (default; same convention as
             mrd.MRD_BACKEND).
"""

from __future__ import annotations

import dataclasses
import os as _os

import jax
import jax.numpy as jnp
from jax import lax

from vocoder_tpu import nn
from vocoder_tpu.convert import conv2d_from_torch

MPD_BACKEND = _os.environ.get("VOCODER_MPD_BACKEND", "auto")  # "auto" | "image" | "folded"


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


def _conv_kx1_as_1d(p: dict, x: jnp.ndarray, *, stride: int, padding: int) -> jnp.ndarray:
    """Apply a (k, 1) conv2d's weights as a conv1d over (B', T, C)."""
    w = nn.weight_norm_weight(p)[:, 0]  # (kh, 1, cin, cout) -> (k, cin, cout)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=nn.DEFAULT_PRECISION,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"]
    return y


def _disc_p_apply(p: dict, x: jnp.ndarray, period: int, cfg: MPDConfig):
    """x: (B, T, 1) -> (score (B, D), fmaps)."""
    b, t, c = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        t = t + n_pad
    x = x.reshape(b, t // period, period, c)  # NHWC

    backend = MPD_BACKEND
    if backend == "auto":
        backend = "folded" if jax.default_backend() == "tpu" else "image"
    if backend == "folded":
        # period -> batch: each column is an independent 1-D signal
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * period, t // period, c)
        fmap = []
        for conv in p["convs"]:
            x = _conv_kx1_as_1d(p=conv, x=x, stride=cfg.stride, padding=cfg.kernel_size // 2)
            x = nn.silu(x)
            fmap.append(x)
        x = _conv_kx1_as_1d(p=p["post"], x=x, stride=1, padding=1)
        fmap.append(x)
        # unfold the score back to the image (b, h, p) element order
        h = x.shape[1]
        score = jnp.transpose(x.reshape(b, period, h), (0, 2, 1)).reshape(b, -1)
        return score, fmap

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
