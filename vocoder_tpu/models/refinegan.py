"""RefineGAN generator, TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/generators/
refinegan.py:37-323: a UNet over an f0-derived template waveform — template
conv, 4 downsample stages (linear-interp decimation + ResBlock, channels x2,
skips saved), mel features concatenated at the bottleneck, 4 upsample stages
(linear-interp upsample + skip concat + ParallelResBlock of 3 kernel sizes,
each sandwiched by AdaIN noise injection), then out-conv + tanh.

AdaIN injects Gaussian noise in BOTH train and eval (refinegan.py:124-127);
the noise key is threaded explicitly (pass rng=...; parity tests zero the
AdaIN weights to compare deterministically).
"""

from __future__ import annotations

import dataclasses
from math import prod

import jax
import jax.numpy as jnp
import numpy as np

from vocoder_tpu import nn
from vocoder_tpu.convert import _np, conv1d_from_torch


@dataclasses.dataclass(frozen=True)
class RefineGANConfig:
    sampling_rate: int = 44100
    hop_length: int = 256
    downsample_rates: tuple = (2, 2, 8, 8)
    upsample_rates: tuple = (8, 8, 2, 2)
    leaky_relu_slope: float = 0.2
    num_mels: int = 128
    start_channels: int = 16

    def __post_init__(self):
        assert prod(self.downsample_rates) == prod(self.upsample_rates) == self.hop_length


def _interp_linear(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on (B, T, C).

    Matches nn.Upsample(scale_factor=scale) with recompute_scale_factor=False:
    out_len = floor(T*scale); src = (dst + 0.5)/scale - 0.5 clamped to >= 0.
    """
    t_in = x.shape[1]
    t_out = int(np.floor(t_in * scale))
    dst = np.arange(t_out, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    src = np.clip(src, 0.0, t_in - 1)
    idx0 = np.floor(src).astype(np.int32)
    idx1 = np.minimum(idx0 + 1, t_in - 1)
    w = (src - idx0).astype(np.float32)
    x0 = jnp.take(x, jnp.asarray(idx0), axis=1)
    x1 = jnp.take(x, jnp.asarray(idx1), axis=1)
    return x0 * (1.0 - jnp.asarray(w))[None, :, None] + x1 * jnp.asarray(w)[None, :, None]


def _resblock_init(key, in_ch: int, out_ch: int, kernel_size: int, dilations: tuple) -> dict:
    keys = jax.random.split(key, 2 * len(dilations))
    convs1 = [
        nn.conv1d_init(keys[2 * i], in_ch if i == 0 else out_ch, out_ch, kernel_size, weight_norm=True)
        for i in range(len(dilations))
    ]
    convs2 = [
        nn.conv1d_init(keys[2 * i + 1], out_ch, out_ch, kernel_size, weight_norm=True)
        for i in range(len(dilations))
    ]
    return {"convs1": convs1, "convs2": convs2}


def _resblock_apply(p: dict, x: jnp.ndarray, in_ch, out_ch, kernel_size, dilations, slope) -> jnp.ndarray:
    for i, (c1, c2, d) in enumerate(zip(p["convs1"], p["convs2"], dilations)):
        xt = nn.leaky_relu(x, slope)
        xt = nn.conv1d(c1, xt, padding=nn.get_padding(kernel_size, d), dilation=d)
        xt = nn.leaky_relu(xt, slope)
        xt = nn.conv1d(c2, xt, padding=nn.get_padding(kernel_size, d), dilation=d)
        if i != 0 or in_ch == out_ch:
            x = xt + x
        else:
            x = xt
    return x


def _adain_apply(p: dict, x: jnp.ndarray, rng, slope: float) -> jnp.ndarray:
    noise = jax.random.normal(rng, x.shape, x.dtype) * p["weight"][None, None, :]
    return nn.leaky_relu(x + noise, slope)


def _parallel_resblock_init(key, in_ch: int, out_ch: int, kernel_sizes: tuple, dilations: tuple) -> dict:
    keys = jax.random.split(key, 1 + len(kernel_sizes))
    blocks = [
        {
            "adain1": {"weight": jnp.ones((out_ch,))},
            "res": _resblock_init(keys[1 + i], out_ch, out_ch, k, dilations),
            "adain2": {"weight": jnp.ones((out_ch,))},
        }
        for i, k in enumerate(kernel_sizes)
    ]
    return {"input_conv": nn.conv1d_init(keys[0], in_ch, out_ch, 7), "blocks": blocks}


def _parallel_resblock_apply(p, x, out_ch, kernel_sizes, dilations, slope, rng):
    x = nn.conv1d(p["input_conv"], x, padding=3)
    rngs = jax.random.split(rng, 2 * len(kernel_sizes))
    outs = []
    for i, (block, k) in enumerate(zip(p["blocks"], kernel_sizes)):
        y = _adain_apply(block["adain1"], x, rngs[2 * i], slope)
        y = _resblock_apply(block["res"], y, out_ch, out_ch, k, dilations, slope)
        y = _adain_apply(block["adain2"], y, rngs[2 * i + 1], slope)
        outs.append(y)
    return sum(outs) / len(outs)


def init(key, cfg: RefineGANConfig) -> dict:
    n_down = len(cfg.downsample_rates)
    n_up = len(cfg.upsample_rates)
    keys = jax.random.split(key, 3 + n_down + n_up)
    it = iter(keys)

    params: dict = {"template_conv": nn.conv1d_init(next(it), 1, cfg.start_channels, 7, weight_norm=True)}
    ch = cfg.start_channels
    down_blocks = []
    for _ in cfg.downsample_rates:
        down_blocks.append(_resblock_init(next(it), ch, ch * 2, 7, (1, 3, 5)))
        ch *= 2
    params["downsample_blocks"] = down_blocks
    params["mel_conv"] = nn.conv1d_init(next(it), cfg.num_mels, ch, 7, weight_norm=True)
    ch *= 2
    up_blocks = []
    for _ in cfg.upsample_rates:
        new_ch = ch // 2
        up_blocks.append(_parallel_resblock_init(next(it), ch + ch // 4, new_ch, (3, 7, 11), (1, 3, 5)))
        ch = new_ch
    params["upsample_conv_blocks"] = up_blocks
    params["output_conv"] = nn.conv1d_init(next(it), ch, 1, 7, weight_norm=True)
    return params


def apply(
    params: dict,
    mel: jnp.ndarray,
    cfg: RefineGANConfig,
    template: jnp.ndarray | None = None,
    *,
    training: bool = False,
    rng=None,
) -> jnp.ndarray:
    """mel (B, num_mels, T), template (B, 1, T*hop) -> audio (B, 1, T*hop)."""
    assert template is not None, "RefineGAN requires an f0-derived template waveform"
    if rng is None:
        rng = jax.random.key(0)
    slope = cfg.leaky_relu_slope

    x = jnp.transpose(template, (0, 2, 1))  # (B, T_audio, 1)
    x = nn.conv1d(params["template_conv"], x, padding=3)

    downs = []
    ch = cfg.start_channels
    for p, rate in zip(params["downsample_blocks"], cfg.downsample_rates):
        x = nn.leaky_relu(x, slope)
        downs.append(x)
        x = _interp_linear(x, 1.0 / rate)
        x = _resblock_apply(p, x, ch, ch * 2, 7, (1, 3, 5), slope)
        ch *= 2

    mel_t = jnp.transpose(mel, (0, 2, 1))
    x = jnp.concatenate([x, nn.conv1d(params["mel_conv"], mel_t, padding=3)], axis=-1)
    ch *= 2

    rngs = jax.random.split(rng, len(cfg.upsample_rates))
    for i, (p, rate, down) in enumerate(
        zip(params["upsample_conv_blocks"], cfg.upsample_rates, reversed(downs))
    ):
        x = nn.leaky_relu(x, slope)
        x = _interp_linear(x, float(rate))
        x = jnp.concatenate([x, down], axis=-1)
        x = _parallel_resblock_apply(p, x, ch // 2, (3, 7, 11), (1, 3, 5), slope, rngs[i])
        ch //= 2

    x = nn.leaky_relu(x, slope)
    x = nn.conv1d(params["output_conv"], x, padding=3)
    x = jnp.tanh(x)
    return jnp.transpose(x, (0, 2, 1))


def from_torch_state_dict(sd: dict, cfg: RefineGANConfig, prefix: str = "") -> dict:
    p = prefix
    params: dict = {"template_conv": conv1d_from_torch(sd, f"{p}template_conv")}
    down_blocks = []
    for i in range(len(cfg.downsample_rates)):
        bp = f"{p}downsample_blocks.{i}.1"  # Sequential: 0=Upsample, 1=ResBlock
        down_blocks.append(
            {
                "convs1": [conv1d_from_torch(sd, f"{bp}.convs1.{j}") for j in range(3)],
                "convs2": [conv1d_from_torch(sd, f"{bp}.convs2.{j}") for j in range(3)],
            }
        )
    params["downsample_blocks"] = down_blocks
    params["mel_conv"] = conv1d_from_torch(sd, f"{p}mel_conv")
    up_blocks = []
    for i in range(len(cfg.upsample_rates)):
        bp = f"{p}upsample_conv_blocks.{i}"
        blocks = []
        for j in range(3):  # kernel sizes (3, 7, 11)
            blocks.append(
                {
                    "adain1": {"weight": _np(sd[f"{bp}.blocks.{j}.0.weight"])},
                    "res": {
                        "convs1": [conv1d_from_torch(sd, f"{bp}.blocks.{j}.1.convs1.{l}") for l in range(3)],
                        "convs2": [conv1d_from_torch(sd, f"{bp}.blocks.{j}.1.convs2.{l}") for l in range(3)],
                    },
                    "adain2": {"weight": _np(sd[f"{bp}.blocks.{j}.2.weight"])},
                }
            )
        up_blocks.append({"input_conv": conv1d_from_torch(sd, f"{bp}.input_conv"), "blocks": blocks})
    params["upsample_conv_blocks"] = up_blocks
    params["output_conv"] = conv1d_from_torch(sd, f"{p}output_conv")
    return jax.tree.map(jnp.asarray, params)
