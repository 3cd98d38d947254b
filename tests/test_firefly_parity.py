"""Allclose parity: firefly-gan-base (ConvNeXt backbone + HiFiGAN head) vs
the composed torch oracle (both reference modules import cleanly)."""

import sys

import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from fish_vocoder.modules.encoders.convnext import ConvNeXtEncoder  # noqa: E402
from fish_vocoder.modules.generators.hifigan import HiFiGANGenerator  # noqa: E402

from vocoder_tpu.models import convnext, firefly, hifigan  # noqa: E402


def test_firefly_matches_composed_oracle():
    torch.manual_seed(0)
    n_mels = 10
    backbone = ConvNeXtEncoder(
        input_channels=n_mels, depths=[1, 2], dims=[24, 32], drop_path_rate=0.0, kernel_size=7
    )
    head = HiFiGANGenerator(
        hop_length=16,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
        num_mels=32,
        upsample_initial_channel=32,
        use_template=False,
        pre_conv_kernel_size=13,
        post_conv_kernel_size=13,
    )
    backbone.eval(), head.eval()

    cfg = firefly.FireflyConfig(
        backbone=convnext.ConvNeXtConfig(input_channels=n_mels, depths=(1, 2), dims=(24, 32)),
        head=hifigan.HiFiGANConfig(
            hop_length=16,
            upsample_rates=(4, 4),
            upsample_kernel_sizes=(8, 8),
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),),
            num_mels=32,
            upsample_initial_channel=32,
            use_template=False,
            pre_conv_kernel_size=13,
            post_conv_kernel_size=13,
        ),
    )
    sd = {f"backbone.{k}": v for k, v in backbone.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    params = firefly.from_torch_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, n_mels, 11)).astype(np.float32)
    with torch.no_grad():
        want = head(backbone(torch.from_numpy(mel))).numpy()

    got = np.asarray(firefly.apply(params, jnp.asarray(mel), cfg))
    assert got.shape == want.shape == (2, 1, 11 * 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
