"""WaveNet posterior encoder (RVC lineage), TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/encoders/
posterior_encoder.py:11-163: pre 1x1 conv -> N gated dilated conv layers with
res/skip connections -> proj; modes "vae" (emit z/mean/logvar with clamped
logvar and train-time sampling), "vqvae" (raw latent), and "bnvae"
(fixed-gamma-0.5 BatchNorm1d on the mean, posterior_encoder.py:128-131,149 —
the KL-collapse guard: pinning the mean's scale keeps the posterior from
matching the prior exactly).  bnvae is dormant in the reference (no shipped
config), so its mutable running statistics are threaded FUNCTIONALLY here:
init() returns them as a separate `bn_state` tree and apply() returns the
updated tree when training (same explicit-state pattern as the EMA VQ).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

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
    mode: str = "vqvae"  # "vae" | "vqvae" | "bnvae"

    def __post_init__(self):
        assert self.mode in ("vae", "vqvae", "bnvae"), f"unknown mode {self.mode!r}"
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


_BN_GAMMA = 0.5  # fixed, non-trainable (mu_bn.weight.fill_(0.5), requires_grad=False)
_BN_EPS = 1e-5  # torch BatchNorm1d defaults
_BN_MOMENTUM = 0.1


def init(key, cfg: PosteriorEncoderConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    out_mult = 2 if cfg.mode != "vqvae" else 1
    params = {
        "pre": nn.conv1d_init(k1, cfg.in_channels, cfg.hidden_channels, 1),
        "enc": _wavenet_init(k2, cfg),
        "proj": nn.conv1d_init(k3, cfg.hidden_channels, cfg.out_channels * out_mult, 1),
    }
    if cfg.mode == "bnvae":
        params["mu_bn"] = {"bias": jnp.zeros((cfg.out_channels,))}  # gamma fixed at 0.5
    return params


def bn_init(cfg: PosteriorEncoderConfig) -> dict:
    """Running statistics for bnvae (non-gradient state, like the EMA VQ)."""
    assert cfg.mode == "bnvae"
    return {
        "mean": jnp.zeros((cfg.out_channels,)),
        "var": jnp.ones((cfg.out_channels,)),
    }


def _bn_apply(params: dict, bn_state: dict, mean: jnp.ndarray, training: bool):
    """torch BatchNorm1d over (B, T, C) with frozen gamma: normalise per
    channel over batch+time (UNMASKED, matching the reference — torch BN
    never sees x_mask; the caller masks z afterwards)."""
    if training:
        mu = jnp.mean(mean, axis=(0, 1))
        var = jnp.var(mean, axis=(0, 1))
        n = mean.shape[0] * mean.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - _BN_MOMENTUM) * bn_state["mean"] + _BN_MOMENTUM * mu,
            "var": (1 - _BN_MOMENTUM) * bn_state["var"] + _BN_MOMENTUM * unbiased,
        }
    else:
        mu, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    out = _BN_GAMMA * (mean - mu) * jax.lax.rsqrt(var + _BN_EPS) + params["mu_bn"]["bias"]
    return out, new_state


def apply(
    params: dict,
    x: jnp.ndarray,
    cfg: PosteriorEncoderConfig,
    lengths: jnp.ndarray | None = None,
    *,
    training: bool = False,
    rng=None,
    bn_state: dict | None = None,
):
    """x: (B, C_in, T) -> vae: (z, mean, logvar, mask (B,1,T)); vqvae: latent
    (B, C_out, T); bnvae: (z, mean, logvar, mask, new_bn_state) with the
    fixed-gamma BatchNorm applied to the mean (pass bn_state from bn_init)."""
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
    new_bn = None
    if cfg.mode == "bnvae":
        assert bn_state is not None, "bnvae needs bn_state (wavenet.bn_init)"
        mean, new_bn = _bn_apply(params, bn_state, mean, training)
    if training:
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        z = (mean + eps * jnp.exp(0.5 * logvar)) * mask
    else:
        z = mean * mask
    tr = lambda a: jnp.transpose(a, (0, 2, 1))
    out4 = (tr(z), tr(mean), tr(logvar), jnp.transpose(mask, (0, 2, 1)))
    return out4 + (new_bn,) if cfg.mode == "bnvae" else out4


def from_torch_state_dict(sd: dict, cfg: PosteriorEncoderConfig, prefix: str = "") -> dict:
    p = prefix
    tree = {
        "pre": conv1d_from_torch(sd, f"{p}pre"),
        "enc": {
            "in_layers": [conv1d_from_torch(sd, f"{p}enc.in_layers.{i}") for i in range(cfg.n_layers)],
            "res_skip_layers": [
                conv1d_from_torch(sd, f"{p}enc.res_skip_layers.{i}") for i in range(cfg.n_layers)
            ],
        },
        "proj": conv1d_from_torch(sd, f"{p}proj"),
    }
    if cfg.mode == "bnvae":
        # gamma is frozen at 0.5 in the reference (mu_bn.weight.fill_(0.5)); only
        # beta is a learnable parameter here.  Running stats load via
        # bn_state_from_torch.
        tree["mu_bn"] = {"bias": np.asarray(sd[f"{p}mu_bn.bias"])}
    return jax.tree.map(jnp.asarray, tree)


def bn_state_from_torch(sd: dict, prefix: str = "") -> dict:
    """Running statistics of the reference's mu_bn BatchNorm1d.

    Copies: jnp.asarray on CPU can alias the torch tensor's buffer, and torch
    updates these buffers in-place on every train-mode forward.
    """
    return {
        "mean": jnp.array(np.array(sd[f"{prefix}mu_bn.running_mean"], copy=True)),
        "var": jnp.array(np.array(sd[f"{prefix}mu_bn.running_var"], copy=True)),
    }
