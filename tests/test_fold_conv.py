"""Space-to-depth folded conv1d == plain conv1d (numerical identity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocoder_tpu import nn


@pytest.mark.parametrize("k,dilation,c,r", [(7, 1, 16, 8), (11, 1, 32, 4), (3, 1, 16, 2), (7, 3, 16, 4), (3, 5, 8, 8)])
def test_folded_conv_matches_plain(k, dilation, c, r):
    key = jax.random.key(0)
    p = nn.conv1d_init(key, c, c, k)
    x = jax.random.normal(jax.random.key(1), (2, 64, c))
    pad = nn.get_padding(k, dilation)
    want = nn.conv1d(p, x, padding=pad, dilation=dilation)
    got = nn.conv1d(p, x, padding=pad, dilation=dilation, fold=r)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fold_falls_back_when_t_not_divisible():
    p = nn.conv1d_init(jax.random.key(0), 8, 8, 7)
    x = jax.random.normal(jax.random.key(1), (1, 63, 8))  # 63 % 8 != 0
    want = nn.conv1d(p, x, padding=3)
    got = nn.conv1d(p, x, padding=3, fold=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cin,cout,k,u,r,t", [(64, 32, 4, 2, 2, 64), (32, 16, 4, 2, 4, 128), (128, 64, 8, 4, 2, 64), (16, 8, 2, 2, 8, 256)])
def test_folded_transposed_conv_matches_plain(cin, cout, k, u, r, t):
    p = nn.conv_transpose1d_init(jax.random.key(0), cin, cout, k, weight_norm=True)
    x = jax.random.normal(jax.random.key(1), (2, t, cin))
    pad = (k - u) // 2
    want = nn.conv_transpose1d(p, x, stride=u, padding=pad)
    got = nn.conv_transpose1d_folded_io(p, x.reshape(2, t // r, r * cin), stride=u, padding=pad, fold=r)
    got = got.reshape(2, t * u, cout)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_conv1d_folded_io_stays_folded():
    p = nn.conv1d_init(jax.random.key(0), 16, 16, 11, weight_norm=True)
    x = jax.random.normal(jax.random.key(1), (2, 256, 16))
    pad = nn.get_padding(11, 5)
    want = nn.conv1d(p, x, padding=pad, dilation=5)
    got = nn.conv1d_folded_io(p, x.reshape(2, 32, 128), padding=pad, dilation=5, fold=8)
    np.testing.assert_allclose(np.asarray(got.reshape(2, 256, 16)), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_hifigan_tail_fold_matches_unfolded():
    """The lane-dense folded tail (TAIL_FOLD) is numerically the plain path,
    including template mode and the folded post conv."""
    from vocoder_tpu.models import hifigan

    for use_tpl in (False, True):
        cfg = hifigan.HiFiGANConfig(hop_length=512, num_mels=8, upsample_initial_channel=64, use_template=use_tpl)
        p = hifigan.init(jax.random.key(0), cfg)
        mel = jax.random.normal(jax.random.key(1), (2, 8, 16))
        tpl = jax.random.normal(jax.random.key(2), (2, 1, 16 * 512)) if use_tpl else None
        old = hifigan.TAIL_FOLD
        try:
            hifigan.TAIL_FOLD = "off"
            want = hifigan.apply(p, mel, cfg, template=tpl)
            hifigan.TAIL_FOLD = "on"
            got = hifigan.apply(p, mel, cfg, template=tpl)
        finally:
            hifigan.TAIL_FOLD = old
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_bigvgan_tail_fold_matches_unfolded():
    """BigVGAN's folded tail (folded convs + aa_snake_poly4_folded) equals the
    plain path, including template mode."""
    from vocoder_tpu.models import bigvgan

    for use_tpl in (False, True):
        cfg = bigvgan.BigVGANConfig(
            hop_length=512, num_mels=8, upsample_initial_channel=64, use_template=use_tpl,
            upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 8, 2, 2),
        )
        p = bigvgan.init(jax.random.key(0), cfg)
        mel = jax.random.normal(jax.random.key(1), (2, 8, 8))
        tpl = jax.random.normal(jax.random.key(2), (2, 1, 8 * 512)) if use_tpl else None
        old = bigvgan.TAIL_FOLD
        try:
            bigvgan.TAIL_FOLD = "off"
            want = bigvgan.apply(p, mel, cfg, template=tpl)
            bigvgan.TAIL_FOLD = "on"
            got = bigvgan.apply(p, mel, cfg, template=tpl)
        finally:
            bigvgan.TAIL_FOLD = old
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_aa_snake_poly4_variants_match():
    """poly4 (XLA-autodiff training form) and its folded variant match the
    custom-VJP polyphase form in values and gradients."""
    from vocoder_tpu.ops import antialias as aa

    t, c, r = 256, 16, 8
    x = jax.random.normal(jax.random.key(0), (2, t, c))
    alpha = jax.random.normal(jax.random.key(1), (c,)) * 0.1
    beta = jax.random.normal(jax.random.key(2), (c,)) * 0.1

    want = aa.aa_snake_polyphase(x, alpha, beta, True)
    got4 = aa.aa_snake_poly4(x, alpha, beta, True)
    gotf = aa.aa_snake_poly4_folded(x.reshape(2, t // r, r * c), alpha, beta, True, r).reshape(2, t, c)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gotf), np.asarray(want), rtol=1e-4, atol=1e-5)

    g1 = jax.grad(lambda *a: jnp.sum(jnp.square(aa.aa_snake_polyphase(*a, True))), argnums=(0, 1, 2))(x, alpha, beta)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.square(aa.aa_snake_poly4(*a, True))), argnums=(0, 1, 2))(x, alpha, beta)
    g3 = jax.grad(
        lambda xx, a_, b_: jnp.sum(jnp.square(aa.aa_snake_poly4_folded(xx.reshape(2, t // r, r * c), a_, b_, True, r))),
        argnums=(0, 1, 2),
    )(x, alpha, beta)
    for a, b_, c_ in zip(g1, g2, g3):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-4 * scale, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(c_), np.asarray(a), atol=1e-4 * scale, rtol=1e-3)


def test_choose_fold_prefers_wide_kernels():
    # k=7 undilated, C=16: the model says folding pays (gain 7/3 ~ 2.3).
    assert nn._choose_fold_impl(7, 1, 3, 16, 1024) > 1
    # k=3 undilated: gain 3/3 == 1 -> no fold.
    assert nn._choose_fold_impl(3, 1, 1, 16, 1024) == 1
    # Wide channels: no headroom.
    assert nn._choose_fold_impl(7, 1, 3, 256, 1024) == 1
    # Disabled by default (measured slower on v5e XLA conv lowering).
    assert nn.choose_fold(7, 1, 3, 16, 1024) == 1


def test_tail_fold_exits_on_odd_kernel_stride_diff():
    """A stage whose (kernel - stride) is odd cannot stay folded; the stack
    must exit the folded domain for it and re-enter after, matching the
    unfolded path (including the reference's odd-kernel length creep)."""
    from vocoder_tpu.models import hifigan

    cfg = hifigan.HiFiGANConfig(
        hop_length=32, upsample_rates=(8, 2, 2), upsample_kernel_sizes=(16, 5, 4),
        num_mels=8, upsample_initial_channel=64,
    )
    p = hifigan.init(jax.random.key(0), cfg)
    mel = jax.random.normal(jax.random.key(1), (2, 8, 16))
    old = hifigan.TAIL_FOLD
    try:
        hifigan.TAIL_FOLD = "off"
        want = hifigan.apply(p, mel, cfg)
        hifigan.TAIL_FOLD = "on"
        got = hifigan.apply(p, mel, cfg)
    finally:
        hifigan.TAIL_FOLD = old
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
