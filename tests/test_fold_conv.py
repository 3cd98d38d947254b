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


def test_choose_fold_prefers_wide_kernels():
    # k=7 undilated, C=16: the model says folding pays (gain 7/3 ~ 2.3).
    assert nn._choose_fold_impl(7, 1, 3, 16, 1024) > 1
    # k=3 undilated: gain 3/3 == 1 -> no fold.
    assert nn._choose_fold_impl(3, 1, 1, 16, 1024) == 1
    # Wide channels: no headroom.
    assert nn._choose_fold_impl(7, 1, 3, 256, 1024) == 1
    # Disabled by default (measured slower on v5e XLA conv lowering).
    assert nn.choose_fold(7, 1, 3, 16, 1024) == 1
