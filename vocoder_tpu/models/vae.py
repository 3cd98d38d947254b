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


def vae_decode(params: dict, z: jnp.ndarray, cfg, training: bool = False) -> jnp.ndarray:
    return hifigan.apply(params["decoder"], z, cfg.decoder, training=training)


def vqvae_init(key, cfg: VQVAEGeneratorConfig) -> tuple[dict, dict]:
    """Returns (params, vq_state) — vq state is non-gradient (EMA)."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"encoder": wavenet.init(k1, cfg.encoder), "decoder": hifigan.init(k2, cfg.decoder)}
    return params, vq_mod.init(k3, cfg.vq)


def vqvae_encode(params: dict, spec: jnp.ndarray, cfg: VQVAEGeneratorConfig) -> jnp.ndarray:
    return wavenet.apply(params["encoder"], spec, cfg.encoder)


def vqvae_decode(params: dict, z: jnp.ndarray, cfg: VQVAEGeneratorConfig, training: bool = False) -> jnp.ndarray:
    return hifigan.apply(params["decoder"], z, cfg.decoder, training=training)


@dataclasses.dataclass(frozen=True)
class SSLCodecGeneratorConfig:
    """hifigan-vae.yaml parity (configs/model/generator/hifigan-vae.yaml:1-18):
    frozen HuBERT backbone -> trainable conv post-net -> EMA-VQ -> HiFiGAN
    decoder at hop 640 (40 ms @ 16 kHz) — the semantic->waveform codec.

    The composition trains through VQVAE semantics (the reference's
    HubertEncoder.forward takes (audio, mask) and is consumed by
    VQVAEModel.forward, models/vae.py:80-83).  TPU split: the frozen backbone
    runs HOST-side in the input pipeline (it takes no gradients — a fixed
    feature extractor); the post-net/VQ/decoder run inside the jitted step.
    """

    latent_size: int
    hubert: "HubertEncoderConfig"
    decoder: hifigan.HiFiGANConfig
    vq: vq_mod.VQConfig


def ssl_init(key, cfg: SSLCodecGeneratorConfig) -> tuple[dict, dict]:
    """Returns (params, vq_state); the frozen backbone owns no JAX params."""
    from vocoder_tpu.models.ssl_encoders import hubert_postnet_init

    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "postnet": hubert_postnet_init(k1, cfg.hubert),
        "decoder": hifigan.init(k2, cfg.decoder),
    }
    return params, vq_mod.init(k3, cfg.vq)


def ssl_encode(params: dict, features: jnp.ndarray, cfg: SSLCodecGeneratorConfig) -> jnp.ndarray:
    """Host-extracted backbone features (B, T', hidden) -> latent (B, latent, T'')."""
    from vocoder_tpu.models.ssl_encoders import hubert_postnet_apply

    x = hubert_postnet_apply(params["postnet"], features)  # (B, T'', latent) channels-last
    return jnp.transpose(x, (0, 2, 1))


def ssl_decode(params: dict, z: jnp.ndarray, cfg: SSLCodecGeneratorConfig, training: bool = False) -> jnp.ndarray:
    return hifigan.apply(params["decoder"], z, cfg.decoder, training=training)


def ssl_encode_to_codes(params: dict, vq_state: dict, features: jnp.ndarray, cfg: SSLCodecGeneratorConfig) -> jnp.ndarray:
    """Codec API: backbone features -> discrete semantic codes."""
    latent = ssl_encode(params, features, cfg)
    _, codes, _, _ = vq_mod.apply(vq_state, latent, cfg.vq, training=False)
    return codes


def ssl_decode_from_codes(params: dict, vq_state: dict, codes: jnp.ndarray, cfg: SSLCodecGeneratorConfig) -> jnp.ndarray:
    latent = vq_mod.from_codes(vq_state, codes, cfg.vq)
    return ssl_decode(params, latent, cfg)


def encode_to_codes(params: dict, vq_state: dict, spec: jnp.ndarray, cfg: VQVAEGeneratorConfig) -> jnp.ndarray:
    """Codec API: features -> discrete codes (unify.py:35-41 parity)."""
    latent = vqvae_encode(params, spec, cfg)
    _, codes, _, _ = vq_mod.apply(vq_state, latent, cfg.vq, training=False)
    return codes


def decode_from_codes(params: dict, vq_state: dict, codes: jnp.ndarray, cfg: VQVAEGeneratorConfig) -> jnp.ndarray:
    """Codec API: codes -> waveform (unify.py:43-53 parity)."""
    latent = vq_mod.from_codes(vq_state, codes, cfg.vq)
    return vqvae_decode(params, latent, cfg)
