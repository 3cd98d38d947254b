"""Vocos generator: ConvNeXt backbone + iSTFT synthesis head + Unify shell.

Capability parity with /root/reference/fish_vocoder/modules/generators/
vocos.py:6-69 (ISTFTHead) and unify.py:5-60 (UnifyGenerator), composed per
configs/model/generator/vocos.yaml.

Reference quirks mirrored deliberately (documented in SURVEY.md):
- ISTFTHead projects to 2*n_fft channels (vocos.py:40-41) although only the
  first n_fft//2+1 of each half feed the iSTFT (torch.fft.irfft trims the
  one-sided spectrum); we keep the 2*n_fft projection for checkpoint parity
  and slice the used bins.
- UnifyGenerator passes ``template=`` to every head (unify.py:25, drift D3);
  our heads accept an optional template uniformly and ISTFTHead ignores it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vocoder_tpu import nn
from vocoder_tpu.convert import conv1d_from_torch
from vocoder_tpu.models import convnext
from vocoder_tpu.ops import istft_same


@dataclasses.dataclass(frozen=True)
class ISTFTHeadConfig:
    dim: int
    n_fft: int
    hop_length: int
    win_length: int
    padding: str = "same"


def istft_head_init(key, cfg: ISTFTHeadConfig) -> dict:
    return {"out": nn.conv1d_init(key, cfg.dim, cfg.n_fft * 2, 1)}


def istft_head_apply(params: dict, x: jnp.ndarray, cfg: ISTFTHeadConfig, template=None, frame_lengths=None) -> jnp.ndarray:
    """x: (B, T, dim) channels-last -> audio (B, T*hop)."""
    if cfg.padding != "same":
        raise NotImplementedError("only vocos 'same' padding is supported (matches shipped configs)")
    from vocoder_tpu.parallel import constrain

    x = nn.conv1d(params["out"], x)  # (B, T, 2*n_fft)
    x = constrain(x, "data", None, "model")  # column-parallel projection output
    bins = cfg.n_fft // 2 + 1
    log_mag = x[..., : cfg.n_fft]
    phase = x[..., cfg.n_fft :]
    mag = jnp.minimum(jnp.exp(log_mag), 1e2)  # clip safeguard (vocos.py:58-61)
    # Only the one-sided bins participate (irfft trims the rest).
    mag = mag[..., :bins]
    phase = phase[..., :bins]
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    # istft expects (B, bins, frames); frame_lengths makes padded frames
    # (whose exp(0)=1 magnitudes are garbage) vanish from the overlap-add.
    return istft_same(
        jnp.transpose(re, (0, 2, 1)),
        jnp.transpose(im, (0, 2, 1)),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        frame_lengths=frame_lengths,
    )


def istft_head_from_torch(sd: dict, prefix: str = "") -> dict:
    return jax.tree.map(jnp.asarray, {"out": conv1d_from_torch(sd, f"{prefix}out")})


@dataclasses.dataclass(frozen=True)
class VocosConfig:
    """UnifyGenerator(backbone=ConvNeXtEncoder, head=ISTFTHead)."""

    backbone: convnext.ConvNeXtConfig
    head: ISTFTHeadConfig

    @staticmethod
    def base(num_mels=128, n_fft=2048, hop_length=512, win_length=2048) -> "VocosConfig":
        # configs/model/generator/vocos.yaml
        return VocosConfig(
            backbone=convnext.ConvNeXtConfig(
                input_channels=num_mels, depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), drop_path_rate=0.4
            ),
            head=ISTFTHeadConfig(dim=1024, n_fft=n_fft, hop_length=hop_length, win_length=win_length),
        )

    @staticmethod
    def huge(num_mels=128, n_fft=2048, hop_length=512, win_length=2048) -> "VocosConfig":
        # configs/model/generator/vocos-huge.yaml
        return VocosConfig(
            backbone=convnext.ConvNeXtConfig(
                input_channels=num_mels, depths=(3, 3, 27, 3), dims=(352, 704, 1408, 2816), drop_path_rate=0.4
            ),
            head=ISTFTHeadConfig(dim=2816, n_fft=n_fft, hop_length=hop_length, win_length=win_length),
        )


def init(key, cfg: VocosConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {"backbone": convnext.init(k1, cfg.backbone), "head": istft_head_init(k2, cfg.head)}


def param_specs(cfg: VocosConfig):
    """Tensor-parallel PartitionSpecs (vocos-huge north star): Megatron MLP
    sharding in the ConvNeXt backbone + column-parallel iSTFT-head projection."""
    from jax.sharding import PartitionSpec as P

    return {
        "backbone": convnext.param_specs(cfg.backbone),
        "head": {"out": {"w": P(None, None, "model"), "b": P("model")}},
    }


def apply(
    params: dict,
    mel: jnp.ndarray,
    cfg: VocosConfig,
    template: jnp.ndarray | None = None,
    *,
    training: bool = False,
    rng=None,
    frame_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """mel (B, num_mels, T) -> audio (B, 1, T*hop); UnifyGenerator.forward parity.

    frame_lengths (B,) enables exact variable-length batching (see
    models/hifigan.py): each row of a right-zero-padded batch equals its
    unbatched forward over the first frame_lengths[i] * hop samples.
    """
    x = jnp.transpose(mel, (0, 2, 1))
    x = convnext.apply(params["backbone"], x, cfg.backbone, training=training, rng=rng, frame_lengths=frame_lengths)
    audio = istft_head_apply(params["head"], x, cfg.head, template=template, frame_lengths=frame_lengths)
    return audio[:, None, :]


def from_torch_state_dict(sd: dict, cfg: VocosConfig, prefix: str = "") -> dict:
    return {
        "backbone": convnext.from_torch_state_dict(sd, cfg.backbone, prefix=f"{prefix}backbone."),
        "head": istft_head_from_torch(sd, prefix=f"{prefix}head."),
    }
