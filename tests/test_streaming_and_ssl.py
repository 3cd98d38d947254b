"""Chunked long-utterance synthesis exactness + SSL encoder wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from vocoder_tpu.models import hifigan
from vocoder_tpu.parallel.streaming import chunked_synthesis


def test_chunked_synthesis_matches_full_pass():
    cfg = hifigan.HiFiGANConfig(
        hop_length=16,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        num_mels=8,
        upsample_initial_channel=32,
    )
    params = hifigan.init(jax.random.key(0), cfg)
    apply_fn = jax.jit(lambda m: hifigan.apply(params, m, cfg))

    rng = np.random.default_rng(0)
    t = 200
    mel = jnp.asarray(rng.standard_normal((1, 8, t)), jnp.float32)

    full = np.asarray(apply_fn(mel))
    chunked = np.asarray(
        chunked_synthesis(apply_fn, mel, hop_length=16, chunk_frames=96, overlap_frames=24)
    )
    assert chunked.shape == full.shape == (1, 1, t * 16)
    # Interior samples are exact (receptive field < overlap); edges differ only
    # by the zero-vs-edge padding of the first/last chunk.
    m = 24 * 16
    np.testing.assert_allclose(chunked[..., m:-m], full[..., m:-m], rtol=1e-4, atol=1e-5)


def test_chunked_synthesis_short_input_passthrough():
    cfg = hifigan.HiFiGANConfig(
        hop_length=4,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        num_mels=4,
        upsample_initial_channel=8,
    )
    params = hifigan.init(jax.random.key(0), cfg)
    apply_fn = lambda m: hifigan.apply(params, m, cfg)
    mel = jnp.zeros((1, 4, 10))
    out = chunked_synthesis(apply_fn, mel, hop_length=4, chunk_frames=64, overlap_frames=8)
    assert out.shape == (1, 1, 40)


def test_hubert_postnet_and_extractor_wiring():
    from vocoder_tpu.models.ssl_encoders import (
        HubertEncoderConfig,
        HubertFeatureExtractor,
        hubert_postnet_apply,
        hubert_postnet_init,
    )

    cfg = HubertEncoderConfig(model_name_or_path="/nonexistent", hidden_size=32, output_size=16)
    import transformers

    # Tiny random backbone (no network): override the config used on fallback.
    orig = transformers.HubertConfig
    transformers.HubertConfig = lambda hidden_size: orig(
        hidden_size=hidden_size,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(32,) * 7,
    )
    try:
        extractor = HubertFeatureExtractor(cfg)
    finally:
        transformers.HubertConfig = orig

    audio = np.zeros((1, 16000), np.float32)
    feats = extractor(audio)
    assert feats.ndim == 3 and feats.shape[0] == 1 and feats.shape[2] == 32

    params = hubert_postnet_init(jax.random.key(0), cfg)
    out = hubert_postnet_apply(params, jnp.asarray(feats))
    assert out.shape[2] == 16
    assert out.shape[1] == (feats.shape[1] + 1) // 2
