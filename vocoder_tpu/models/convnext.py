"""1-D ConvNeXt encoder, TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/encoders/
convnext.py:78-214 (stem conv + LN, per-stage LN + 1x1-conv transitions,
ConvNeXtBlock = depthwise conv k=7 -> LN -> pointwise x mlp_ratio -> GELU ->
pointwise -> layer-scale gamma -> stochastic-depth residual, final LN).

The reference permutes (N,C,L) <-> (N,L,C) around every block
(convnext.py:128,137); here activations are channels-last throughout — zero
permutes, and the pointwise convs are plain (lane-aligned) matmuls on the MXU.
Backbone of the Vocos / vocos-huge / firefly-gan-base generators
(configs/model/generator/vocos.yaml:1-9).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vocoder_tpu import nn
from vocoder_tpu.convert import conv1d_from_torch, layer_norm_from_torch, linear_from_torch, _np


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    input_channels: int = 3
    depths: tuple = (3, 3, 9, 3)
    dims: tuple = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    kernel_size: int = 7
    mlp_ratio: float = 4.0
    dilation: int = 1

    def __post_init__(self):
        assert len(self.depths) == len(self.dims)


def _block_init(key, dim: int, cfg: ConvNeXtConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(cfg.mlp_ratio * dim)
    p = {
        "dwconv": nn.conv1d_init(k1, dim, dim, cfg.kernel_size, groups=dim, init="trunc_normal"),
        "norm": nn.layer_norm_init(dim),
        "pwconv1": nn.linear_init(k2, dim, hidden, init="trunc_normal"),
        "pwconv2": nn.linear_init(k3, hidden, dim, init="trunc_normal"),
    }
    if cfg.layer_scale_init_value > 0:
        # NB: explicit dtype — jnp.full with a python float yields a
        # weak-typed array, which changes type after the first optimizer
        # update and forces a full train-step recompile at step 2.
        p["gamma"] = jnp.full((dim,), cfg.layer_scale_init_value, dtype=jnp.float32)
    return p


def _block_apply(p: dict, x: jnp.ndarray, cfg: ConvNeXtConfig, drop_rate: float, training: bool, rng) -> jnp.ndarray:
    from vocoder_tpu.parallel import constrain

    inp = x
    pad = int(cfg.dilation * (cfg.kernel_size - 1) / 2)
    x = nn.conv1d(p["dwconv"], x, padding=pad, dilation=cfg.dilation, groups=x.shape[-1])
    x = nn.layer_norm(p["norm"], x)
    # Megatron-style MLP under a ("data","model") mesh: pwconv1 is
    # column-parallel (hidden sharded over "model", pinned here so GSPMD can't
    # replicate the 4x-dim activation), pwconv2 row-parallel (psum back to a
    # model-replicated block output at the residual).  No-ops without a mesh.
    x = nn.linear(p["pwconv1"], x)
    x = constrain(x, "data", None, "model")
    x = nn.gelu(x)
    x = nn.linear(p["pwconv2"], x)
    x = constrain(x, "data")
    if "gamma" in p:
        x = p["gamma"] * x
    if training and drop_rate > 0.0:
        x = nn.drop_path(rng, x, drop_rate, training)
    return inp + x


def init(key, cfg: ConvNeXtConfig) -> dict:
    n_stages = len(cfg.depths)
    keys = jax.random.split(key, 2 * n_stages + sum(cfg.depths))
    it = iter(keys)

    downsample = [
        {
            "conv": nn.conv1d_init(next(it), cfg.input_channels, cfg.dims[0], cfg.kernel_size, init="trunc_normal"),
            "norm": nn.layer_norm_init(cfg.dims[0]),
        }
    ]
    for i in range(n_stages - 1):
        downsample.append(
            {
                "norm": nn.layer_norm_init(cfg.dims[i]),
                "conv": nn.conv1d_init(next(it), cfg.dims[i], cfg.dims[i + 1], 1, init="trunc_normal"),
            }
        )

    stages = []
    for i in range(n_stages):
        stages.append([_block_init(next(it), cfg.dims[i], cfg) for _ in range(cfg.depths[i])])

    return {"downsample": downsample, "stages": stages, "norm": nn.layer_norm_init(cfg.dims[-1])}


def param_specs(cfg: ConvNeXtConfig):
    """PartitionSpec tree mirroring init(): Megatron tensor parallelism.

    The MLP weights (97% of vocos-huge's 650M params) shard over "model":
    pwconv1 column-parallel (output/hidden axis), pwconv2 row-parallel (input/
    hidden axis) — one psum per block, activations between blocks replicated
    on "model".  dwconv/norms/transitions are <3% of bytes and replicate.
    """
    from jax.sharding import PartitionSpec as P

    R = P()  # replicated

    def block_spec(dim: int) -> dict:
        p = {
            "dwconv": {"w": R, "b": R},
            "norm": {"scale": R, "bias": R},
            "pwconv1": {"w": P(None, "model"), "b": P("model")},
            "pwconv2": {"w": P("model", None), "b": R},
        }
        if cfg.layer_scale_init_value > 0:
            p["gamma"] = R
        return p

    downsample = [{"conv": {"w": R, "b": R}, "norm": {"scale": R, "bias": R}} for _ in cfg.depths]
    stages = [[block_spec(cfg.dims[i]) for _ in range(d)] for i, d in enumerate(cfg.depths)]
    return {"downsample": downsample, "stages": stages, "norm": {"scale": R, "bias": R}}


def _drop_rates(cfg: ConvNeXtConfig) -> list[list[float]]:
    import numpy as np

    total = sum(cfg.depths)
    rates = np.linspace(0, cfg.drop_path_rate, total)
    out, cur = [], 0
    for d in cfg.depths:
        out.append([float(r) for r in rates[cur : cur + d]])
        cur += d
    return out


def apply(params: dict, x: jnp.ndarray, cfg: ConvNeXtConfig, *, training: bool = False, rng=None, frame_lengths=None) -> jnp.ndarray:
    """x: (B, T, C_in) channels-last -> (B, T, dims[-1]).

    frame_lengths (B,) masks a right-zero-padded variable-length batch so
    each row computes what it would alone: only the depthwise convs (and the
    stem conv) mix time, so re-masking after the stem and after every block's
    residual re-establishes each item's implicit zero padding (LN/pointwise
    layers are per-position; their pad-row garbage never crosses a mask).
    """
    from vocoder_tpu.parallel import constrain

    def mask(v):
        return nn.length_mask(v, frame_lengths)

    x = constrain(x, "data")
    rates = _drop_rates(cfg)
    n_blocks = sum(cfg.depths)
    if training and cfg.drop_path_rate > 0.0:
        rngs = iter(jax.random.split(rng, n_blocks))
    for i, down in enumerate(params["downsample"]):
        if i == 0:
            x = nn.conv1d(down["conv"], x, padding=cfg.kernel_size // 2)
            x = nn.layer_norm(down["norm"], x)
        else:
            x = nn.layer_norm(down["norm"], x)
            x = nn.conv1d(down["conv"], x)
        # One mask per stage entry (LN/1x1 put bias garbage in pad rows) so
        # the first block's depthwise conv sees clean zeros.
        x = mask(x)
        for j, block in enumerate(params["stages"][i]):
            r = next(rngs) if (training and cfg.drop_path_rate > 0.0) else None
            x = mask(_block_apply(block, x, cfg, rates[i][j], training, r))
    return nn.layer_norm(params["norm"], x)


def from_torch_state_dict(sd: dict, cfg: ConvNeXtConfig, prefix: str = "") -> dict:
    p = prefix
    n_stages = len(cfg.depths)
    downsample = [
        {
            "conv": conv1d_from_torch(sd, f"{p}downsample_layers.0.0"),
            "norm": layer_norm_from_torch(sd, f"{p}downsample_layers.0.1"),
        }
    ]
    for i in range(1, n_stages):
        downsample.append(
            {
                "norm": layer_norm_from_torch(sd, f"{p}downsample_layers.{i}.0"),
                "conv": conv1d_from_torch(sd, f"{p}downsample_layers.{i}.1"),
            }
        )
    stages = []
    for i in range(n_stages):
        blocks = []
        for j in range(cfg.depths[i]):
            bp = f"{p}stages.{i}.{j}"
            block = {
                "dwconv": conv1d_from_torch(sd, f"{bp}.dwconv"),
                "norm": layer_norm_from_torch(sd, f"{bp}.norm"),
                "pwconv1": linear_from_torch(sd, f"{bp}.pwconv1"),
                "pwconv2": linear_from_torch(sd, f"{bp}.pwconv2"),
            }
            if f"{bp}.gamma" in sd:
                block["gamma"] = _np(sd[f"{bp}.gamma"])
            blocks.append(block)
        stages.append(blocks)
    out = {"downsample": downsample, "stages": stages, "norm": layer_norm_from_torch(sd, f"{p}norm")}
    return jax.tree.map(jnp.asarray, out)
