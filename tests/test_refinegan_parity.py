"""Allclose parity: vocoder_tpu RefineGAN vs the reference torch generator.

AdaIN injects fresh Gaussian noise on every forward (refinegan.py:124-127), so
for the deterministic comparison the AdaIN weights are zeroed on BOTH sides;
a separate test checks the noisy path runs and differs per key.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, "/root/reference")
from fish_vocoder.modules.generators.refinegan import RefineGANGenerator  # noqa: E402

from vocoder_tpu.models import refinegan  # noqa: E402

SMALL = dict(
    sampling_rate=8000,
    hop_length=64,
    downsample_rates=(2, 2, 4, 4),
    upsample_rates=(4, 4, 2, 2),
    num_mels=12,
    start_channels=8,
)


def test_interp_linear_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 37)).astype(np.float32)  # torch (B, C, T)
    for scale in [0.5, 0.25, 2.0, 4.0, 1.0 / 3]:
        want = F.interpolate(torch.from_numpy(x), scale_factor=scale, mode="linear").numpy()
        got = np.asarray(
            refinegan._interp_linear(jnp.asarray(x).transpose(0, 2, 1), scale)
        ).transpose(0, 2, 1)
        assert got.shape == want.shape, (scale, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=f"scale={scale}")


def test_refinegan_matches_torch_reference_noiseless():
    torch.manual_seed(0)
    ref = RefineGANGenerator(**SMALL)
    ref.eval()
    with torch.no_grad():  # zero every AdaIN weight -> deterministic forward
        for name, param in ref.named_parameters():
            if ".blocks." in name and name.endswith(".weight") and param.ndim == 1:
                param.zero_()

    cfg = refinegan.RefineGANConfig(**SMALL)
    params = refinegan.from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    b, t = 2, 8
    mel = rng.standard_normal((b, SMALL["num_mels"], t)).astype(np.float32)
    template = rng.standard_normal((b, 1, t * SMALL["hop_length"])).astype(np.float32) * 0.3

    with torch.no_grad():
        want = ref(torch.from_numpy(mel), torch.from_numpy(template)).numpy()

    got = np.asarray(
        refinegan.apply(params, jnp.asarray(mel), cfg, jnp.asarray(template), rng=jax.random.key(1))
    )
    assert got.shape == want.shape == (b, 1, t * SMALL["hop_length"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_refinegan_noise_path():
    cfg = refinegan.RefineGANConfig(**SMALL)
    params = refinegan.init(jax.random.key(0), cfg)
    mel = jnp.zeros((1, SMALL["num_mels"], 4))
    template = jnp.ones((1, 1, 4 * SMALL["hop_length"])) * 0.1
    y1 = refinegan.apply(params, mel, cfg, template, rng=jax.random.key(1))
    y2 = refinegan.apply(params, mel, cfg, template, rng=jax.random.key(2))
    assert y1.shape == (1, 1, 4 * SMALL["hop_length"])
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # AdaIN noise differs per key
