"""Allclose parity: vocoder_tpu BigVGAN vs the reference torch generator.

The absent `alias_free_torch` dependency is stood in by a faithful oracle
(tests/oracles.py), letting /root/reference's bigvgan.py import and serve as
the end-to-end oracle.  BASELINE.md config 4.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.oracles import TorchActivation1d, install_fake_alias_free_torch

install_fake_alias_free_torch()
sys.path.insert(0, "/root/reference")
from fish_vocoder.modules.generators.bigvgan import (  # noqa: E402
    BigVGANGenerator,
    Snake,
    SnakeBeta,
)

from vocoder_tpu.models import bigvgan  # noqa: E402
from vocoder_tpu.ops.antialias import downsample1d, upsample1d  # noqa: E402

SMALL = dict(
    hop_length=16,
    upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    num_mels=12,
    upsample_initial_channel=32,
    pre_conv_kernel_size=7,
    post_conv_kernel_size=7,
)


def test_up_down_sample_match_alias_free_oracle():
    from tests.oracles import TorchDownSample1d, TorchUpSample1d

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 64)).astype(np.float32)  # torch (B, C, T)

    with torch.no_grad():
        want_up = TorchUpSample1d(2)(torch.from_numpy(x)).numpy()
        want_down = TorchDownSample1d(2)(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(x).transpose(0, 2, 1)
    got_up = np.asarray(upsample1d(xj, 2)).transpose(0, 2, 1)
    got_down = np.asarray(downsample1d(xj, 2)).transpose(0, 2, 1)

    assert got_up.shape == want_up.shape == (2, 6, 128)
    assert got_down.shape == want_down.shape == (2, 6, 32)
    np.testing.assert_allclose(got_up, want_up, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_down, want_down, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind,logscale", [("snake", False), ("snakebeta", True)])
def test_snake_activation_parity(kind, logscale):
    torch.manual_seed(0)
    c = 8
    ref = (Snake if kind == "snake" else SnakeBeta)(c, alpha_logscale=logscale)
    with torch.no_grad():
        ref.alpha.normal_(0, 0.5)
        if kind == "snakebeta":
            ref.beta.normal_(0, 0.5)

    p = {"alpha": jnp.asarray(ref.alpha.detach().numpy())}
    if kind == "snakebeta":
        p["beta"] = jnp.asarray(ref.beta.detach().numpy())

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, c, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(
        bigvgan._snake_apply(p, jnp.asarray(x).transpose(0, 2, 1), logscale)
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_template", [False, True])
def test_bigvgan_matches_torch_reference(use_template):
    torch.manual_seed(0)
    ref = BigVGANGenerator(use_template=use_template, **SMALL)
    ref.eval()

    cfg = bigvgan.BigVGANConfig(use_template=use_template, **SMALL)
    params = bigvgan.from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    b, t = 2, 9
    mel = rng.standard_normal((b, SMALL["num_mels"], t)).astype(np.float32)
    template = rng.standard_normal((b, 1, t * SMALL["hop_length"])).astype(np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(mel), torch.from_numpy(template) if use_template else None
        ).numpy()

    got = np.asarray(
        bigvgan.apply(params, jnp.asarray(mel), cfg, jnp.asarray(template) if use_template else None)
    )
    assert got.shape == want.shape == (b, 1, t * SMALL["hop_length"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bigvgan_init_runs():
    import jax

    cfg = bigvgan.BigVGANConfig(**SMALL)
    params = bigvgan.init(jax.random.key(0), cfg)
    out = bigvgan.apply(params, jnp.zeros((1, SMALL["num_mels"], 6)), cfg)
    assert out.shape == (1, 1, 6 * SMALL["hop_length"])


def test_polyphase_aa_snake_matches_composition():
    from vocoder_tpu.ops.antialias import aa_snake_polyphase

    rng = np.random.default_rng(7)
    for t, c, logscale in [(128, 16, True), (96, 8, False), (40, 4, True)]:
        x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
        alpha = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)
        a2 = jnp.exp(alpha)[None, :] if logscale else alpha[None, :]
        b2 = jnp.exp(beta)[None, :] if logscale else beta[None, :]
        from vocoder_tpu.ops.antialias import downsample1d, upsample1d

        y = upsample1d(x, 2)
        y = y + (1.0 / (b2 + 1e-9)) * jnp.square(jnp.sin(y * a2))
        want = np.asarray(downsample1d(y, 2))
        got = np.asarray(aa_snake_polyphase(x, alpha, beta, logscale))
        assert got.shape == want.shape, (t, c)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg=f"{t},{c},{logscale}")


def test_bigvgan_masked_variable_length_batching_exact():
    """frame_lengths batching: per-layer masks plus the per-item dynamic
    edge splice in aa_snake_poly4_masked make each row of a right-zero-padded
    batch equal its unbatched forward."""
    import jax
    import jax.numpy as jnp

    from vocoder_tpu.models import bigvgan

    cfg = bigvgan.BigVGANConfig(
        hop_length=512, num_mels=8, upsample_initial_channel=64,
        upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 8, 2, 2),
    )
    p = bigvgan.init(jax.random.key(0), cfg)
    f1, f2 = 10, 14
    m1 = jax.random.normal(jax.random.key(1), (1, 8, f1))
    m2 = jax.random.normal(jax.random.key(2), (1, 8, f2))
    y1 = bigvgan.apply(p, m1, cfg)
    y2 = bigvgan.apply(p, m2, cfg)
    batch = jnp.concatenate([jnp.pad(m1, ((0, 0), (0, 0), (0, f2 - f1))), m2])
    yb = bigvgan.apply(p, batch, cfg, frame_lengths=jnp.asarray([f1, f2]))
    np.testing.assert_allclose(np.asarray(yb[0:1, :, : f1 * 512]), np.asarray(y1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(yb[1:2]), np.asarray(y2), atol=1e-6)
