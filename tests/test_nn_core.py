"""Core nn-layer invariants: weight norm, folding, layouts, param counts."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from vocoder_tpu import nn
from vocoder_tpu.models.registry import available, get_generator


def test_weight_norm_matches_torch_conv1d():
    torch.manual_seed(0)
    conv = torch.nn.utils.parametrizations.weight_norm(torch.nn.Conv1d(6, 10, 5, padding=2))
    sd = conv.state_dict()
    from vocoder_tpu.convert import conv1d_from_torch

    p = jax.tree.map(jnp.asarray, conv1d_from_torch({f"c.{k}": v for k, v in sd.items()}, "c"))
    x = np.random.default_rng(0).standard_normal((2, 6, 17)).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()
    got = np.asarray(nn.conv1d(p, jnp.asarray(x).transpose(0, 2, 1), padding=2)).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # Folding is exact and idempotent.
    folded = nn.fold_weight_norm(p)
    assert "w" in folded and "v" not in folded
    got_f = np.asarray(nn.conv1d(folded, jnp.asarray(x).transpose(0, 2, 1), padding=2)).transpose(0, 2, 1)
    np.testing.assert_allclose(got_f, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(nn.fold_weight_norm(folded)["w"]), np.asarray(folded["w"])
    )


def test_registry_lists_all_families():
    names = available()
    for expected in ["hifigan", "vocos", "bigvgan", "refinegan", "firefly_gan_base"]:
        assert expected in names, names
        d = get_generator(expected)
        assert callable(d.init) and callable(d.apply)


def test_param_count_known_value():
    p = {"a": jnp.zeros((3, 4)), "b": [jnp.zeros((5,)), {"c": jnp.zeros((2, 2, 2))}]}
    assert nn.param_count(p) == 12 + 5 + 8


def test_leaky_relu_and_gelu_match_torch():
    x = np.linspace(-3, 3, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(nn.leaky_relu(jnp.asarray(x), 0.2)),
        torch.nn.functional.leaky_relu(torch.from_numpy(x), 0.2).numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(nn.gelu(jnp.asarray(x))),
        torch.nn.functional.gelu(torch.from_numpy(x)).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(nn.silu(jnp.asarray(x))),
        torch.nn.functional.silu(torch.from_numpy(x)).numpy(),
        rtol=1e-6,
        atol=1e-7,
    )


def test_remat_checkpointing_flag_trains():
    """cfg.checkpointing=True (jax.remat over resblocks, drift D4 made a real
    flag) must trace through grad for both upsampling generators, with the
    folded/masked call signatures."""
    import jax
    import jax.numpy as jnp

    from vocoder_tpu.models import bigvgan, hifigan

    mel = jax.random.normal(jax.random.key(1), (2, 8, 16))

    cfg = hifigan.HiFiGANConfig(hop_length=512, num_mels=8, upsample_initial_channel=64, checkpointing=True)
    p = hifigan.init(jax.random.key(0), cfg)
    g = jax.grad(lambda pp: jnp.sum(jnp.square(hifigan.apply(pp, mel, cfg, training=True))))(p)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))

    bcfg = bigvgan.BigVGANConfig(
        hop_length=512, num_mels=8, upsample_initial_channel=64, checkpointing=True,
        upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 8, 2, 2),
    )
    bp = bigvgan.init(jax.random.key(0), bcfg)
    bg = jax.grad(lambda pp: jnp.sum(jnp.square(bigvgan.apply(pp, mel, bcfg, training=True))))(bp)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(bg))
