"""Loss-level parity for MPD/MRD discriminators and the MR-STFT loss.

Scores/feature-maps only ever feed permutation-invariant mean/L1 reductions
(models/gan.py:146-156,201-206), so parity is asserted on the loss scalars,
which also exercises quirk Q3 (MRD concat-vs-list weighting) end to end.
"""

import sys

import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from fish_vocoder.modules.discriminators.mpd import MultiPeriodDiscriminator  # noqa: E402
from fish_vocoder.modules.discriminators.mrd import MultiResolutionDiscriminator  # noqa: E402
from fish_vocoder.modules.losses.stft import MultiResolutionSTFTLoss  # noqa: E402

from vocoder_tpu.losses import (  # noqa: E402
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    multi_resolution_stft_loss,
)
from vocoder_tpu.models import mpd, mrd  # noqa: E402


def _torch_gen_losses(disc, fake, real):
    score_fakes, feat_fake = disc(fake)
    _, feat_real = disc(real)
    loss_fake = 0
    for s in score_fakes:
        loss_fake = loss_fake + torch.mean((1 - s) ** 2)
    loss_fm = 0
    for dr, dg in zip(feat_real, feat_fake):
        for rl, gl in zip(dr, dg):
            loss_fm = loss_fm + torch.nn.functional.l1_loss(rl, gl)
    return loss_fake.item(), loss_fm.item()


def _torch_disc_loss(disc, real, fake):
    scores, _ = disc(real)
    score_fakes, _ = disc(fake)
    loss = 0
    for s, sf in zip(scores, score_fakes):
        loss = loss + torch.mean((s - 1) ** 2) + torch.mean(sf**2)
    return loss.item()


def test_mpd_loss_parity():
    torch.manual_seed(0)
    periods = [2, 3, 5]
    ref = MultiPeriodDiscriminator(periods=periods)
    ref.eval()

    cfg = mpd.MPDConfig(periods=tuple(periods))
    params = mpd.from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    b, t = 2, 1900
    fake = rng.standard_normal((b, 1, t)).astype(np.float32) * 0.1
    real = rng.standard_normal((b, 1, t)).astype(np.float32) * 0.1

    with torch.no_grad():
        want_adv, want_fm = _torch_gen_losses(ref, torch.from_numpy(fake), torch.from_numpy(real))
        want_d = _torch_disc_loss(ref, torch.from_numpy(real), torch.from_numpy(fake))

    sf, ff = mpd.apply(params, jnp.asarray(fake), cfg)
    sr, fr = mpd.apply(params, jnp.asarray(real), cfg)
    got_adv = float(generator_adversarial_loss(sf))
    got_fm = float(feature_matching_loss(fr, ff))
    got_d = float(discriminator_loss(sr, sf))

    np.testing.assert_allclose(got_adv, want_adv, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got_fm, want_fm, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-5)


def test_mrd_loss_parity_incl_q3_weighting():
    torch.manual_seed(1)
    resolutions = [[256, 64, 256], [128, 32, 128]]
    ref = MultiResolutionDiscriminator(resolutions=resolutions)
    ref.eval()

    cfg = mrd.MRDConfig(resolutions=tuple(tuple(r) for r in resolutions))
    params = mrd.from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(1)
    b, t = 3, 2048  # b>1 so the Q3 row-iteration weighting is actually exercised
    fake = rng.standard_normal((b, 1, t)).astype(np.float32) * 0.1
    real = rng.standard_normal((b, 1, t)).astype(np.float32) * 0.1

    with torch.no_grad():
        want_adv, want_fm = _torch_gen_losses(ref, torch.from_numpy(fake), torch.from_numpy(real))
        want_d = _torch_disc_loss(ref, torch.from_numpy(real), torch.from_numpy(fake))

    sf, ff = mrd.apply(params, jnp.asarray(fake), cfg)
    sr, fr = mrd.apply(params, jnp.asarray(real), cfg)
    got_adv = float(generator_adversarial_loss(sf))
    got_fm = float(feature_matching_loss(fr, ff))
    got_d = float(discriminator_loss(sr, sf))

    np.testing.assert_allclose(got_adv, want_adv, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got_fm, want_fm, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-5)


def test_mrd_folded_backend_matches_plain():
    """The freq-folded TPU conv path (structural-zero block-banded weights,
    lane-dense C=128 images) must agree with the plain path at loss AND
    gradient level — scores unfolded exactly, folded fmaps carrying the F4/F
    mean-compensation scale."""
    import jax

    cfg = mrd.MRDConfig()  # full 5-resolution config incl. odd F = n_fft/2+1
    params = mrd.init(jax.random.key(0), cfg)
    fake = jax.random.normal(jax.random.key(1), (2, 1, 16384)) * 0.1
    real = jax.random.normal(jax.random.key(2), (2, 1, 16384)) * 0.1

    def losses(params, backend):
        old = mrd.MRD_BACKEND
        mrd.MRD_BACKEND = backend
        try:
            sf, ff = mrd.apply(params, fake, cfg)
            sr, fr = mrd.apply(params, real, cfg)
            return (
                generator_adversarial_loss(sf)
                + feature_matching_loss(fr, ff)
                + discriminator_loss(sr, sf)
            )
        finally:
            mrd.MRD_BACKEND = old

    lp, gp = jax.value_and_grad(losses)(params, "plain")
    lf, gf = jax.value_and_grad(losses)(params, "folded")
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    scale = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(gp))
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-4 * scale, rtol=1e-3)


def test_mpd_folded_backend_matches_image():
    """Period-into-batch conv1d stack (dense sublanes on TPU) must agree with
    the literal (B, T/p, p, C) conv2d images at loss AND gradient level.
    The (k,1) kernels never mix across the period axis, so the dot products
    are identical; scores are unfolded back to the image element order."""
    import jax

    cfg = mpd.MPDConfig(periods=(3, 5, 7, 11, 17, 23, 37))  # gan.yaml primes
    params = mpd.init(jax.random.key(0), cfg)
    # T=8192+5 exercises the pad-to-multiple-of-p path for every period
    fake = jax.random.normal(jax.random.key(1), (2, 1, 8197)) * 0.1
    real = jax.random.normal(jax.random.key(2), (2, 1, 8197)) * 0.1

    def losses(params, backend):
        old = mpd.MPD_BACKEND
        mpd.MPD_BACKEND = backend
        try:
            sf, ff = mpd.apply(params, fake, cfg)
            sr, fr = mpd.apply(params, real, cfg)
            return (
                generator_adversarial_loss(sf)
                + feature_matching_loss(fr, ff)
                + discriminator_loss(sr, sf)
            )
        finally:
            mpd.MPD_BACKEND = old

    li, gi = jax.value_and_grad(losses)(params, "image")
    lf, gf = jax.value_and_grad(losses)(params, "folded")
    np.testing.assert_allclose(float(lf), float(li), rtol=1e-5)
    scale = max(float(jnp.max(jnp.abs(a))) for a in jax.tree.leaves(gi))
    for a, b_ in zip(jax.tree.leaves(gi), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-4 * scale, rtol=1e-3)


def test_mpd_folded_scores_exact_order():
    """Folded-backend scores are element-for-element the image scores."""
    import jax

    cfg = mpd.MPDConfig(periods=(3, 11))
    params = mpd.init(jax.random.key(3), cfg)
    x = jax.random.normal(jax.random.key(4), (2, 1, 4099)) * 0.1
    old = mpd.MPD_BACKEND
    try:
        mpd.MPD_BACKEND = "image"
        si, _ = mpd.apply(params, x, cfg)
        mpd.MPD_BACKEND = "folded"
        sf, _ = mpd.apply(params, x, cfg)
    finally:
        mpd.MPD_BACKEND = old
    for a, b_ in zip(si, sf):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-5, atol=1e-6)


def test_mr_stft_loss_parity():
    torch.manual_seed(2)
    resolutions = [[256, 64, 128], [512, 120, 300]]
    ref = MultiResolutionSTFTLoss(resolutions=resolutions)

    rng = np.random.default_rng(2)
    b, t = 2, 4000
    x = rng.standard_normal((b, t)).astype(np.float32) * 0.3
    y = rng.standard_normal((b, t)).astype(np.float32) * 0.3

    with torch.no_grad():
        want_sc, want_mag = ref(torch.from_numpy(x), torch.from_numpy(y))

    got_sc, got_mag = multi_resolution_stft_loss(
        jnp.asarray(x), jnp.asarray(y), tuple(tuple(r) for r in resolutions)
    )
    np.testing.assert_allclose(float(got_sc), want_sc.item(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(got_mag), want_mag.item(), rtol=1e-3, atol=1e-5)
