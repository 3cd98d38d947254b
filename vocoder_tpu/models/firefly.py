"""Firefly-GAN base generator: ConvNeXt backbone + HiFiGAN head.

Capability parity with configs/model/generator/firefly-gan-base.yaml — the
UnifyGenerator composition (unify.py:5-33) of a ConvNeXtEncoder
(depths [3,3,9,3], dims [128,256,384,512]) feeding a HiFiGANGenerator head
whose ``num_mels`` is the backbone output dim (512).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vocoder_tpu.models import convnext, hifigan


@dataclasses.dataclass(frozen=True)
class FireflyConfig:
    backbone: convnext.ConvNeXtConfig
    head: hifigan.HiFiGANConfig


def init(key, cfg: FireflyConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {"backbone": convnext.init(k1, cfg.backbone), "head": hifigan.init(k2, cfg.head)}


def apply(
    params: dict,
    mel: jnp.ndarray,
    cfg: FireflyConfig,
    template: jnp.ndarray | None = None,
    *,
    training: bool = False,
    rng=None,
) -> jnp.ndarray:
    """mel (B, num_mels, T) -> audio (B, 1, T*hop)."""
    x = jnp.transpose(mel, (0, 2, 1))
    x = convnext.apply(params["backbone"], x, cfg.backbone, training=training, rng=rng)
    # HiFiGAN head expects channel-first features (its public interface).
    return hifigan.apply(params["head"], jnp.transpose(x, (0, 2, 1)), cfg.head, template)


def from_torch_state_dict(sd: dict, cfg: FireflyConfig, prefix: str = "") -> dict:
    return {
        "backbone": convnext.from_torch_state_dict(sd, cfg.backbone, prefix=f"{prefix}backbone."),
        "head": hifigan.from_torch_state_dict(sd, cfg.head, prefix=f"{prefix}head."),
    }
