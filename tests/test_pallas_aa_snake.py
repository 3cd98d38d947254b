"""Fused anti-aliased Snake Pallas kernel == unfused composition (exact).

Runs in Pallas interpreter mode on CPU; the same kernel compiles for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocoder_tpu.ops.antialias import downsample1d, upsample1d
from vocoder_tpu.ops.pallas.aa_snake import fused_aa_snake, snake


def _reference(x, alpha, beta, logscale):
    if logscale:
        alpha, beta = jnp.exp(alpha), jnp.exp(beta)
    return downsample1d(snake(upsample1d(x, 2), alpha[None, :], beta[None, :]), 2)


@pytest.mark.parametrize("logscale", [False, True])
@pytest.mark.parametrize("t,c", [(128, 16), (96, 8), (256, 32)])
def test_fused_matches_unfused(t, c, logscale):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)

    want = np.asarray(_reference(x, alpha, beta, logscale))
    got = np.asarray(fused_aa_snake(x, alpha, beta, logscale, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_short_input_falls_back():
    x = jnp.ones((1, 40, 4))
    alpha = jnp.zeros(4)
    beta = jnp.zeros(4)
    got = fused_aa_snake(x, alpha, beta, True, interpret=True)
    want = _reference(x, alpha, beta, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
