"""WaveNet posterior encoder (RVC lineage), TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/encoders/
posterior_encoder.py:11-163: pre 1x1 conv -> N gated dilated conv layers with
res/skip connections -> proj; modes "vae" (emit z/mean/logvar with clamped
logvar and train-time sampling) and "vqvae" (raw latent).

The reference's "bnvae" mode (fixed-gamma BatchNorm on the mean,
posterior_encoder.py:128-131) is not shipped by any config and needs mutable
batch statistics; it is intentionally not implemented (raises).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vocoder_tpu import nn
from vocoder_tpu.convert import conv1d_from_torch


@dataclasses.dataclass(frozen=True)
class PosteriorEncoderConfig:
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    dilation_cycle: int = 1
    n_layers: int = 16
    mode: str = "vqvae"  # "vae" | "vqvae"

    def __post_init__(self):
        assert self.mode in ("vae", "vqvae"), f"mode {self.mode!r} (bnvae unsupported; see docstring)"
        assert self.kernel_size % 2 == 1


def _wavenet_init(key, cfg: PosteriorEncoderConfig) -> dict:
    keys = jax.random.split(key, 2 * cfg.n_layers)
    in_layers, res_skip_layers = [], []
    h = cfg.hidden_channels
    for i in range(cfg.n_layers):
        in_layers.append(nn.conv1d_init(keys[2 * i], h, 2 * h, cfg.kernel_size, weight_norm=True))
        res_skip = 2 * h if i < cfg.n_layers - 1 else h
        res_skip_layers.append(nn.conv1d_init(keys[2 * i + 1], h, res_skip, 1, weight_norm=True))
    return {"in_layers": in_layers, "res_skip_layers": res_skip_layers}


def _wavenet_apply(p: dict, x: jnp.ndarray, x_mask: jnp.ndarray, cfg: PosteriorEncoderConfig) -> jnp.ndarray:
    """x: (B, T, H), x_mask: (B, T, 1) -> (B, T, H)."""
    h = cfg.hidden_channels
    output = jnp.zeros_like(x)
    for i in range(cfg.n_layers):
        dilation = cfg.dilation_rate ** (i % cfg.dilation_cycle)
        pad = (cfg.kernel_size * dilation - dilation) // 2
        x_in = nn.conv1d(p["in_layers"][i], x, padding=pad, dilation=dilation)
        acts = jnp.tanh(x_in[..., :h]) * jax.nn.sigmoid(x_in[..., h:])
        res_skip = nn.conv1d(p["res_skip_layers"][i], acts)
        if i < cfg.n_layers - 1:
            x = (x + res_skip[..., :h]) * x_mask
            output = output + res_skip[..., h:]
        else:
            output = output + res_skip
    return output * x_mask


def init(key, cfg: PosteriorEncoderConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    out_mult = 2 if cfg.mode != "vqvae" else 1
    return {
        "pre": nn.conv1d_init(k1, cfg.in_channels, cfg.hidden_channels, 1),
        "enc": _wavenet_init(k2, cfg),
        "proj": nn.conv1d_init(k3, cfg.hidden_channels, cfg.out_channels * out_mult, 1),
    }


def apply(
    params: dict,
    x: jnp.ndarray,
    cfg: PosteriorEncoderConfig,
    lengths: jnp.ndarray | None = None,
    *,
    training: bool = False,
    rng=None,
):
    """x: (B, C_in, T) -> vae: (z, mean, logvar, mask (B,1,T)); vqvae: latent (B, C_out, T)."""
    xt = jnp.transpose(x, (0, 2, 1))  # (B, T, C)
    t = xt.shape[1]
    if lengths is not None:
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(xt.dtype)[..., None]
    else:
        mask = jnp.ones((xt.shape[0], t, 1), xt.dtype)

    h = nn.conv1d(params["pre"], xt) * mask
    h = _wavenet_apply(params["enc"], h, mask, cfg)
    out = nn.conv1d(params["proj"], h) * mask

    if cfg.mode == "vqvae":
        return jnp.transpose(out, (0, 2, 1))

    mean = out[..., : cfg.out_channels]
    logvar = jnp.clip(out[..., cfg.out_channels :], -30.0, 20.0)
    if training:
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        z = (mean + eps * jnp.exp(0.5 * logvar)) * mask
    else:
        z = mean * mask
    tr = lambda a: jnp.transpose(a, (0, 2, 1))
    return tr(z), tr(mean), tr(logvar), jnp.transpose(mask, (0, 2, 1))


def from_torch_state_dict(sd: dict, cfg: PosteriorEncoderConfig, prefix: str = "") -> dict:
    p = prefix
    return jax.tree.map(
        jnp.asarray,
        {
            "pre": conv1d_from_torch(sd, f"{p}pre"),
            "enc": {
                "in_layers": [conv1d_from_torch(sd, f"{p}enc.in_layers.{i}") for i in range(cfg.n_layers)],
                "res_skip_layers": [
                    conv1d_from_torch(sd, f"{p}enc.res_skip_layers.{i}") for i in range(cfg.n_layers)
                ],
            },
            "proj": conv1d_from_torch(sd, f"{p}proj"),
        },
    )
