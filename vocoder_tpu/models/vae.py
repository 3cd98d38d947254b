"""VAE / VQ-VAE generator compositions (encoder -> [vq] -> decoder).

Capability parity with /root/reference/fish_vocoder/models/vae.py:7-109
(VAEModel / VQVAEModel) and the encoder/decoder ModuleDict generators
(configs/model/generator/{vocos-small-vae,hifigan-vae}.yaml).

NOTE: the reference's shipped VAE/VQVAE configs cannot instantiate as-is
(SURVEY.md drift D1/D2: VocosGenerator doesn't exist, vocos-small-vae passes
an unknown kwarg, the vqvae encoder is called with arguments it doesn't
accept).  This module implements the *intended* behaviour with working typed
compositions: a ConvNeXt or WaveNet encoder over the linear spectrogram, an
optional EMA-VQ bottleneck, and a HiFiGAN decoder.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from vocoder_tpu.models import convnext, hifigan, vq as vq_mod, wavenet


@dataclasses.dataclass(frozen=True)
class VAEGeneratorConfig:
    """Encoder emits 2*latent channels (mean|logvar); decoder consumes latent."""

    latent_size: int
    encoder_kind: str  # "convnext" | "wavenet"
    encoder: Any
    decoder: hifigan.HiFiGANConfig


@dataclasses.dataclass(frozen=True)
class VQVAEGeneratorConfig:
    """Encoder emits latent channels; EMA-VQ bottleneck; decoder consumes latent."""

    latent_size: int
    encoder: wavenet.PosteriorEncoderConfig  # mode="vqvae"
    decoder: hifigan.HiFiGANConfig
    vq: vq_mod.VQConfig


def vae_init(key, cfg: VAEGeneratorConfig) -> dict:
    k1, k2 = jax.random.split(key)
    if cfg.encoder_kind == "convnext":
        enc = convnext.init(k1, cfg.encoder)
    elif cfg.encoder_kind == "wavenet":
        enc = wavenet.init(k1, cfg.encoder)
    else:
        raise ValueError(cfg.encoder_kind)
    return {"encoder": enc, "decoder": hifigan.init(k2, cfg.decoder)}


def vae_encode(params: dict, spec: jnp.ndarray, cfg: VAEGeneratorConfig) -> jnp.ndarray:
    """spec (B, C, T) -> raw latent (B, 2*latent, T) (chunked by the task layer,
    mirroring VAEModel.forward at vae.py:16-17)."""
    if cfg.encoder_kind == "convnext":
        x = convnext.apply(params["encoder"], jnp.transpose(spec, (0, 2, 1)), cfg.encoder)
        return jnp.transpose(x, (0, 2, 1))
    return wavenet.apply(params["encoder"], spec, cfg.encoder)  # vqvae-mode raw out


def vae_decode(params: dict, z: jnp.ndarray, cfg) -> jnp.ndarray:
    return hifigan.apply(params["decoder"], z, cfg.decoder)


def vqvae_init(key, cfg: VQVAEGeneratorConfig) -> tuple[dict, dict]:
    """Returns (params, vq_state) — vq state is non-gradient (EMA)."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"encoder": wavenet.init(k1, cfg.encoder), "decoder": hifigan.init(k2, cfg.decoder)}
    return params, vq_mod.init(k3, cfg.vq)


def vqvae_encode(params: dict, spec: jnp.ndarray, cfg: VQVAEGeneratorConfig) -> jnp.ndarray:
    return wavenet.apply(params["encoder"], spec, cfg.encoder)


def vqvae_decode(params: dict, z: jnp.ndarray, cfg: VQVAEGeneratorConfig) -> jnp.ndarray:
    return hifigan.apply(params["decoder"], z, cfg.decoder)


def encode_to_codes(params: dict, vq_state: dict, spec: jnp.ndarray, cfg: VQVAEGeneratorConfig) -> jnp.ndarray:
    """Codec API: features -> discrete codes (unify.py:35-41 parity)."""
    latent = vqvae_encode(params, spec, cfg)
    _, codes, _, _ = vq_mod.apply(vq_state, latent, cfg.vq, training=False)
    return codes


def decode_from_codes(params: dict, vq_state: dict, codes: jnp.ndarray, cfg: VQVAEGeneratorConfig) -> jnp.ndarray:
    """Codec API: codes -> waveform (unify.py:43-53 parity)."""
    latent = vq_mod.from_codes(vq_state, codes, cfg.vq)
    return vqvae_decode(params, latent, cfg)
