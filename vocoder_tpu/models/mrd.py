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
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vocoder_tpu import nn
from vocoder_tpu.convert import conv2d_from_torch
from vocoder_tpu.ops import stft_magnitude

# Conv backends (numerically equivalent up to fp summation order):
#   "plain"  — NHWC convs at C=32.  On TPU the 32-channel minor dim is padded
#              to the 128-lane tile, so every elementwise/backward fusion on
#              the (B, F, T', 32) images wastes 4x of the VPU and 4x of HBM
#              traffic; profiling shows these images are ~50% of the whole
#              HiFiGAN GAN train step.
#   "folded" — frequency axis folded by 4 into channels (C: 32 -> 128): the
#              freq-stride-1 kernel-3 conv becomes a kernel-3 conv over folded
#              rows with a block-banded (structural-zero) 128x128 weight per
#              tap, built from the real weights with a constant 0/1 selection
#              tensor.  All intermediate images are lane-dense; scores and the
#              post fmap are unfolded back (exact), and folded fmaps carry a
#              (F4/F) scale so jnp.mean-based feature matching is exact.
#   "auto"   — folded on TPU, plain elsewhere (default).
MRD_BACKEND = "auto"
_FOLD = 4


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


_STRIDES = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
_PADS = [(1, 4), (1, 4), (1, 4), (1, 4), (1, 1)]


def _disc_r_apply(p: dict, audio: jnp.ndarray, res: tuple):
    """audio: (B, T) -> (score (B, D), fmaps)."""
    n_fft, hop, win = res
    # NB: the reference calls torch.stft WITHOUT a window here (mrd.py:62-69),
    # i.e. a rectangular window — mirrored via window="boxcar".
    mag = stft_magnitude(
        audio, n_fft=n_fft, hop_length=hop, win_length=win, padding="same_nfft", mag_mode="plain", window="boxcar"
    )  # (B, F, TT)
    backend = MRD_BACKEND
    if backend == "auto":
        backend = "folded" if jax.default_backend() == "tpu" else "plain"
    if backend == "folded":
        return _disc_r_convs_folded(p, mag)
    x = mag[..., None]  # NHWC with H=freq, W=frames
    fmap = []
    for conv, s, pd in zip(p["convs"], _STRIDES, _PADS):
        x = nn.conv2d(conv, x, stride=s, padding=pd)
        x = nn.silu(x)
        fmap.append(x)
    x = nn.conv2d(p["post"], x, padding=(1, 1))
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


@functools.cache
def _fold_selection(f: int) -> np.ndarray:
    """S[Q, ri, r, dh1] = 1 iff folded-row tap Q/input-phase ri contributes the
    original freq tap dh = ri + f*(Q-1) - r (dh1 = dh+1) to output phase r."""
    s = np.zeros((3, f, f, 3), np.float32)
    for q in range(3):
        for ri in range(f):
            for r in range(f):
                dh = ri + f * (q - 1) - r
                if -1 <= dh <= 1:
                    s[q, ri, r, dh + 1] = 1.0
    return s


def _folded_conv2d(p: dict, x: jnp.ndarray, *, stride_t: int, pad_t: int, f: int = _FOLD) -> jnp.ndarray:
    """Freq-folded equivalent of nn.conv2d(kernel_h=3, pad_h=1, stride_h=1).

    x: (B, Q, T, f*Ci) with row 4q+r of the original image living in channel
    block r.  The folded kernel W[Q, kw, ri*Ci+ci, r*Co+co] scatters the
    normalized 3-tap weight along the (Q, ri, r) fold band (structural zeros
    elsewhere); zero Q-padding reproduces the original freq zero-padding
    because only the original pad row of each out-of-range block has nonzero
    weight.
    """
    w = nn.weight_norm_weight(p)  # (3, kw, Ci, Co)
    kh, kw, ci, co = w.shape
    assert kh == 3, kh
    sel = jnp.asarray(_fold_selection(f), w.dtype)
    wf = jnp.einsum("qard,dwio->qwairo", sel, w).reshape(3, kw, f * ci, f * co)
    y = jax.lax.conv_general_dilated(
        x,
        wf,
        window_strides=(1, stride_t),
        padding=[(1, 1), (pad_t, pad_t)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=nn.DEFAULT_PRECISION,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + jnp.tile(p["b"], f)
    return y


def _disc_r_convs_folded(p: dict, mag: jnp.ndarray, f: int = _FOLD):
    b, n_freq, _t = mag.shape
    q_rows = -(-n_freq // f)
    f4 = q_rows * f
    x = jnp.pad(mag, ((0, 0), (0, f4 - n_freq), (0, 0)))
    x = x.reshape(b, q_rows, f, -1).transpose(0, 1, 3, 2)  # (B, Q, T, f), Ci=1
    # Slack rows (>= n_freq) must stay zero between layers: the next conv's
    # bottom-edge outputs read them as the original zero padding.
    rowmask = (np.arange(f4).reshape(q_rows, f) < n_freq).astype(np.float32)
    # Folded fmaps have f4/n_freq more (all-zero) elements than the original;
    # pre-scaling restores exact jnp.mean-based feature-matching values.
    fm_scale = f4 / n_freq
    fmap = []
    for conv, s, pd in zip(p["convs"], _STRIDES, _PADS):
        co = nn.weight_norm_weight(conv).shape[-1]
        mask = jnp.asarray(np.repeat(rowmask, co, axis=1)[None, :, None, :], x.dtype)
        x = _folded_conv2d(conv, x, stride_t=s[1], pad_t=pd[1], f=f)
        x = nn.silu(x) * mask
        fmap.append(x * jnp.asarray(fm_scale, x.dtype))
    y = _folded_conv2d(p["post"], x, stride_t=1, pad_t=1, f=f)
    # Unfold the post output (Co=1, small) so scores exclude slack rows.
    y = y.reshape(b, q_rows, -1, f, 1).transpose(0, 1, 3, 2, 4).reshape(b, f4, -1, 1)
    y = y[:, :n_freq]
    fmap.append(y)
    return y.reshape(b, -1), fmap


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
