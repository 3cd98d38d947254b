"""Allclose parity: WaveNet posterior encoder vs the reference torch module.

The reference module imports `fish_vocoder.utils.mask` whose package __init__
pulls hydra (absent), so stub sub-modules are pre-registered with a
behaviour-equivalent sequence_mask before import.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch


def _install_utils_stub():
    if "fish_vocoder.utils.mask" in sys.modules:
        return
    import torch as _t

    utils = types.ModuleType("fish_vocoder.utils")
    mask_mod = types.ModuleType("fish_vocoder.utils.mask")

    def sequence_mask(lengths, max_length=None):
        if max_length is None:
            max_length = lengths.max()
        x = _t.arange(max_length, dtype=lengths.dtype, device=lengths.device)
        return x.unsqueeze(0) < lengths.unsqueeze(1)

    mask_mod.sequence_mask = sequence_mask
    utils.mask = mask_mod
    sys.modules["fish_vocoder.utils"] = utils
    sys.modules["fish_vocoder.utils.mask"] = mask_mod


sys.path.insert(0, "/root/reference")
_install_utils_stub()
from fish_vocoder.modules.encoders.posterior_encoder import PosteriorEncoder  # noqa: E402

from vocoder_tpu.models import wavenet  # noqa: E402

SMALL = dict(in_channels=10, out_channels=6, hidden_channels=12, kernel_size=5, n_layers=4)


def test_posterior_encoder_vqvae_mode_parity():
    torch.manual_seed(0)
    ref = PosteriorEncoder(mode="vqvae", **SMALL)
    ref.eval()

    cfg = wavenet.PosteriorEncoderConfig(mode="vqvae", **SMALL)
    params = wavenet.from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, SMALL["in_channels"], 23)).astype(np.float32)
    lengths = np.asarray([23, 15])

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(lengths)).numpy()
    got = np.asarray(wavenet.apply(params, jnp.asarray(x), cfg, jnp.asarray(lengths)))
    assert got.shape == want.shape == (2, SMALL["out_channels"], 23)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_posterior_encoder_vae_mode_parity_eval():
    torch.manual_seed(1)
    ref = PosteriorEncoder(mode="vae", **SMALL)
    ref.eval()  # eval -> z == mean (deterministic)

    cfg = wavenet.PosteriorEncoderConfig(mode="vae", **SMALL)
    params = wavenet.from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, SMALL["in_channels"], 17)).astype(np.float32)

    with torch.no_grad():
        want_z, want_mean, want_logvar, want_mask = ref(torch.from_numpy(x))
    got_z, got_mean, got_logvar, got_mask = wavenet.apply(params, jnp.asarray(x), cfg, training=False)
    np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mean), want_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_logvar), want_logvar.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mask), want_mask.numpy())


def test_posterior_encoder_bnvae_mode_parity_eval():
    """bnvae eval: BN uses the (loaded) running stats; z == bn(mean) * mask."""
    torch.manual_seed(2)
    ref = PosteriorEncoder(mode="bnvae", **SMALL)
    # Make the running stats non-trivial so the test actually exercises them.
    with torch.no_grad():
        ref.mu_bn.running_mean.uniform_(-0.5, 0.5)
        ref.mu_bn.running_var.uniform_(0.5, 2.0)
        ref.mu_bn.bias.uniform_(-0.3, 0.3)
    ref.eval()

    cfg = wavenet.PosteriorEncoderConfig(mode="bnvae", **SMALL)
    params = wavenet.from_torch_state_dict(ref.state_dict(), cfg)
    bn_state = wavenet.bn_state_from_torch(ref.state_dict())

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, SMALL["in_channels"], 19)).astype(np.float32)
    lengths = np.asarray([19, 11])

    with torch.no_grad():
        want_z, want_mean, want_logvar, _ = ref(torch.from_numpy(x), torch.from_numpy(lengths))
    got_z, got_mean, got_logvar, _, new_bn = wavenet.apply(
        params, jnp.asarray(x), cfg, jnp.asarray(lengths), training=False, bn_state=bn_state
    )
    np.testing.assert_allclose(np.asarray(got_z), want_z.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mean), want_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_logvar), want_logvar.numpy(), rtol=1e-4, atol=1e-5)
    # eval must not touch the running stats
    np.testing.assert_array_equal(np.asarray(new_bn["mean"]), np.asarray(bn_state["mean"]))


def test_posterior_encoder_bnvae_training_stats_parity():
    """bnvae train: batch-stat normalisation + running-stat EMA match torch."""
    torch.manual_seed(3)
    ref = PosteriorEncoder(mode="bnvae", **SMALL)
    ref.train()

    cfg = wavenet.PosteriorEncoderConfig(mode="bnvae", **SMALL)
    params = wavenet.from_torch_state_dict(ref.state_dict(), cfg)
    bn_state = wavenet.bn_state_from_torch(ref.state_dict())

    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, SMALL["in_channels"], 13)).astype(np.float32)

    with torch.no_grad():
        _, want_mean, _, _ = ref(torch.from_numpy(x))  # mean is deterministic even in train
    _, got_mean, _, _, new_bn = wavenet.apply(
        params, jnp.asarray(x), cfg, training=True, rng=jax.random.key(0), bn_state=bn_state
    )
    np.testing.assert_allclose(np.asarray(got_mean), want_mean.numpy(), rtol=1e-4, atol=1e-5)
    # torch updated its running buffers in-place during forward
    np.testing.assert_allclose(
        np.asarray(new_bn["mean"]), ref.mu_bn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_bn["var"]), ref.mu_bn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )


def test_posterior_encoder_vae_training_sampling():
    cfg = wavenet.PosteriorEncoderConfig(mode="vae", **SMALL)
    params = wavenet.init(jax.random.key(0), cfg)
    x = jnp.ones((1, SMALL["in_channels"], 8))
    z1, m, lv, _ = wavenet.apply(params, x, cfg, training=True, rng=jax.random.key(1))
    z2, _, _, _ = wavenet.apply(params, x, cfg, training=True, rng=jax.random.key(2))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    assert np.asarray(lv).max() <= 20.0 and np.asarray(lv).min() >= -30.0
