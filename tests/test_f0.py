"""f0 estimation + template synthesis (RefineGAN end-to-end enabler)."""

import numpy as np

from vocoder_tpu.data.f0 import estimate_f0, template_from_f0


def test_f0_pure_tone():
    sr, hop = 16000, 256
    for hz in [110.0, 220.0, 440.0]:
        t = np.arange(sr)  # 1 s
        x = 0.5 * np.sin(2 * np.pi * hz * t / sr)
        f0 = estimate_f0(x, sr, hop)
        voiced = f0[4:-4][f0[4:-4] > 0]
        assert voiced.size > 0.9 * (len(f0) - 8), hz
        np.testing.assert_allclose(np.median(voiced), hz, rtol=0.02, err_msg=str(hz))


def test_f0_silence_is_unvoiced():
    sr, hop = 16000, 256
    rng = np.random.default_rng(0)
    x = 1e-4 * rng.standard_normal(sr // 2)
    f0 = estimate_f0(x, sr, hop)
    assert (f0 == 0).mean() > 0.8


def test_template_matches_f0():
    sr, hop = 16000, 256
    f0 = np.full(32, 200.0, np.float32)
    tpl = template_from_f0(f0, sr, hop)
    assert tpl.shape == (32 * hop,)
    # The template itself should re-estimate to ~200 Hz.
    back = estimate_f0(tpl, sr, hop)
    voiced = back[back > 0]
    np.testing.assert_allclose(np.median(voiced), 200.0, rtol=0.02)


def test_template_unvoiced_zero_and_continuity():
    sr, hop = 16000, 64
    f0 = np.concatenate([np.full(8, 150.0), np.zeros(4), np.full(8, 150.0)]).astype(np.float32)
    tpl = template_from_f0(f0, sr, hop)
    mid = tpl[9 * hop : 11 * hop]
    assert np.abs(mid).max() < 1e-6  # unvoiced gap silent
    assert np.abs(tpl[: 8 * hop]).max() > 0.05


def test_refinegan_with_generated_template():
    import jax
    import jax.numpy as jnp

    from vocoder_tpu.models import refinegan

    cfg = refinegan.RefineGANConfig(
        sampling_rate=16000,
        hop_length=64,
        downsample_rates=(2, 2, 4, 4),
        upsample_rates=(4, 4, 2, 2),
        num_mels=8,
        start_channels=8,
    )
    params = refinegan.init(jax.random.key(0), cfg)
    frames = 16
    f0 = np.full(frames, 220.0, np.float32)
    tpl = template_from_f0(f0, 16000, 64)[None, None, :]
    mel = jnp.zeros((1, 8, frames))
    out = refinegan.apply(params, mel, cfg, jnp.asarray(tpl), rng=jax.random.key(1))
    assert out.shape == (1, 1, frames * 64)
