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
@pytest.mark.parametrize("t,c", [(128, 16), (96, 8), (256, 32), (512, 16), (64, 128)])
def test_fused_matches_unfused(t, c, logscale):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)

    want = np.asarray(_reference(x, alpha, beta, logscale))
    got = np.asarray(fused_aa_snake(x, alpha, beta, logscale, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("logscale", [False, True])
def test_fused_grad_matches_unfused_autodiff(logscale):
    """The shared hand-written VJP (aa_snake_core_bwd) == autodiff of the
    reference up->snake->down composition, through BOTH forwards (the XLA
    polyphase and the Pallas kernel)."""
    from vocoder_tpu.ops.antialias import aa_snake_polyphase

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 256, 32)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(32) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(32) * 0.3, jnp.float32)

    def loss(fn):
        return lambda x, a, b: jnp.sum(jnp.square(jnp.sin(fn(x, a, b))))

    g_ref = jax.grad(loss(lambda x, a, b: _reference(x, a, b, logscale)), argnums=(0, 1, 2))(
        x, alpha, beta
    )
    g_poly = jax.grad(
        loss(lambda x, a, b: aa_snake_polyphase(x, a, b, logscale)), argnums=(0, 1, 2)
    )(x, alpha, beta)
    g_fused = jax.grad(
        loss(lambda x, a, b: fused_aa_snake(x, a, b, logscale, True)), argnums=(0, 1, 2)
    )(x, alpha, beta)
    for got, name in [(g_poly, "poly"), (g_fused, "pallas")]:
        for g, r in zip(got, g_ref):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
            )


def test_fused_short_input_falls_back():
    x = jnp.ones((1, 40, 4))
    alpha = jnp.zeros(4)
    beta = jnp.zeros(4)
    got = fused_aa_snake(x, alpha, beta, True, interpret=True)
    want = _reference(x, alpha, beta, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,fold", [(16, 8), (32, 4), (64, 2)])
def test_folded_pipeline_pallas_backend_matches_xla(c, fold):
    """AA_FOLDED_BACKEND='pallas': the kernel called from the FOLDED pipeline
    (free unfold -> kernel -> free refold) equals aa_snake_poly4_folded, i.e.
    the alias_free_torch composition, exactly — the round-3 one-HBM-pass
    candidate for the folded tail (BENCH.md)."""
    from vocoder_tpu.ops.antialias import aa_snake_poly4_folded

    rng = np.random.default_rng(2)
    t = 1024  # multiple of every tested fold
    x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)

    b = x.shape[0]
    xf = x.reshape(b, t // fold, fold * c)
    want = np.asarray(aa_snake_poly4_folded(xf, alpha, beta, True, fold))
    got = np.asarray(
        fused_aa_snake(x, alpha, beta, True, interpret=True).reshape(b, t // fold, fold * c)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend", ["shift", "dense"])
@pytest.mark.parametrize("fold", [1, 4, 8])
def test_dwconv_alt_backends_match_conv_backend(monkeypatch, backend, fold):
    """The shift-FMA depthwise-FIR lowering (layout-flip-free, r3 profile
    finding) must agree with the conv/matmul lowering on both the unfolded
    and folded paths."""
    from vocoder_tpu.ops import antialias as aa

    rng = np.random.default_rng(0)
    c, rows = 16, 64
    alpha = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    if fold == 1:
        x = jnp.asarray(rng.standard_normal((2, rows * 8, c)), jnp.float32)
        monkeypatch.setattr(aa, "DWCONV_BACKEND", backend)
        z_shift = aa.aa_snake_poly4(x, alpha, beta, True)
        monkeypatch.setattr(aa, "DWCONV_BACKEND", "conv")
        z_conv = aa.aa_snake_poly4(x, alpha, beta, True)
    else:
        xf = jnp.asarray(rng.standard_normal((2, rows, fold * c)), jnp.float32)
        monkeypatch.setattr(aa, "DWCONV_BACKEND", backend)
        z_shift = aa.aa_snake_poly4_folded(xf, alpha, beta, True, fold)
        monkeypatch.setattr(aa, "DWCONV_BACKEND", "conv")
        z_conv = aa.aa_snake_poly4_folded(xf, alpha, beta, True, fold)
    np.testing.assert_allclose(np.asarray(z_shift), np.asarray(z_conv), rtol=2e-5, atol=2e-5)
