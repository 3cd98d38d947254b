"""The fused GAN train step: shapes, updates, and overfit-decreases-loss.

This is the integration test SURVEY.md §4 calls for (the reference has no
tests): one utterance, tiny model, assert the validation mel-L1 drops.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vocoder_tpu.models import hifigan, mpd, mrd
from vocoder_tpu.train import gan
from vocoder_tpu.train.schedule import WarmupCosineConfig


def tiny_cfg(crop=True):
    hop = 4
    return gan.GANTaskConfig(
        sampling_rate=8000,
        n_fft=16,
        hop_length=hop,
        win_length=16,
        num_mels=8,
        generator_name="hifigan",
        generator=hifigan.HiFiGANConfig(
            hop_length=hop,
            upsample_rates=(2, 2),
            upsample_kernel_sizes=(4, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 2),),
            num_mels=8,
            upsample_initial_channel=16,
        ),
        mpd=mpd.MPDConfig(periods=(2, 3), channels=(1, 4, 8)),
        mrd=mrd.MRDConfig(resolutions=((16, 4, 16), (32, 8, 32))),
        stft_resolutions=((16, 4, 16), (32, 8, 32)),
        num_frames=32,
        crop_length=hop * 8 if crop else None,
        schedule=WarmupCosineConfig(val_base=2e-4, max_decay_steps=1000),
    )


def test_train_step_runs_and_updates_both_optimizers():
    cfg = tiny_cfg()
    state = gan.create_train_state(jax.random.key(0), cfg)
    step = jax.jit(gan.make_train_step(cfg))

    t = cfg.hop_length * cfg.num_frames
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 1, t)) * 0.3, jnp.float32),
        "lengths": jnp.asarray([t, t - 17]),
    }
    g0 = state.gen_params
    d0 = state.disc_params
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    for k in [
        "train/generator/all",
        "train/generator/stft",
        "train/generator/mel",
        "train/generator/adv_mpd",
        "train/generator/adv_fm_mrd",
        "train/generator/grad_norm",
        "train/discriminator/all",
        "train/discriminator/mpd",
        "train/discriminator/mrd",
        "train/discriminator/grad_norm_mpd",
        "lr",
    ]:
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), k

    # Both parameter sets changed.
    def _delta(a, b):
        return sum(float(jnp.abs(x - y).sum()) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert _delta(g0, state.gen_params) > 0
    assert _delta(d0, state.disc_params) > 0


def test_overfit_single_utterance_mel_decreases():
    cfg = tiny_cfg(crop=False)
    state = gan.create_train_state(jax.random.key(1), cfg)
    step = jax.jit(gan.make_train_step(cfg))
    eval_step = jax.jit(gan.make_eval_step(cfg))

    t = cfg.hop_length * cfg.num_frames
    rng = np.random.default_rng(1)
    # A soft periodic target is learnable quickly.
    tt = np.arange(t) / cfg.sampling_rate
    wave = 0.5 * np.sin(2 * np.pi * 220 * tt) + 0.1 * rng.standard_normal(t)
    batch = {
        "audio": jnp.asarray(wave, jnp.float32)[None, None, :],
        "lengths": jnp.asarray([t]),
    }

    first, _ = eval_step(state, batch)
    for _ in range(40):
        state, _ = step(state, batch)
    last, _ = eval_step(state, batch)
    assert float(last["val/metrics/mel"]) < float(first["val/metrics/mel"]), (
        float(first["val/metrics/mel"]),
        float(last["val/metrics/mel"]),
    )


def _refinegan_cfg():
    from vocoder_tpu.models import refinegan

    hop = 4
    return tiny_cfg(crop=False).replace(
        generator_name="refinegan",
        generator=refinegan.RefineGANConfig(
            sampling_rate=8000,
            hop_length=hop,
            downsample_rates=(2, 2),
            upsample_rates=(2, 2),
            num_mels=8,
            start_channels=4,
        ),
    )


def test_refinegan_trains_with_template():
    """Template waveform flows batch -> generator_forward -> RefineGAN; the
    overfit run decreases mel-L1 (VERDICT round-1 missing #4)."""
    from vocoder_tpu.data.f0 import estimate_f0, template_from_f0

    cfg = _refinegan_cfg()
    assert gan.needs_template(cfg)
    state = gan.create_train_state(jax.random.key(2), cfg)
    step = jax.jit(gan.make_train_step(cfg))
    eval_step = jax.jit(gan.make_eval_step(cfg))

    t = cfg.hop_length * cfg.num_frames
    tt = np.arange(t) / cfg.sampling_rate
    wave = (0.5 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
    f0 = estimate_f0(wave, cfg.sampling_rate, cfg.hop_length)
    template = template_from_f0(f0, cfg.sampling_rate, cfg.hop_length)
    batch = {
        "audio": jnp.asarray(wave)[None, None, :],
        "lengths": jnp.asarray([t]),
        "template": jnp.asarray(template)[None, None, :],
    }

    first, _ = eval_step(state, batch)
    for _ in range(30):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train/generator/all"]))
    last, _ = eval_step(state, batch)
    assert float(last["val/metrics/mel"]) < float(first["val/metrics/mel"])


def test_template_required_is_loud():
    """A template generator with no template in the batch fails with a clear
    error instead of an opaque assert (round-1: crashed at step 1)."""
    import pytest

    cfg = _refinegan_cfg()
    state = gan.create_train_state(jax.random.key(2), cfg)
    t = cfg.hop_length * cfg.num_frames
    batch = {"audio": jnp.zeros((1, 1, t), jnp.float32), "lengths": jnp.asarray([t])}
    with pytest.raises(ValueError, match="template"):
        jax.jit(gan.make_train_step(cfg))(state, batch)


def test_lr_schedule_matches_reference_formula():
    import math

    from vocoder_tpu.train.schedule import warmup_cosine

    cfg = WarmupCosineConfig(val_base=1e-4, val_final=0.0, max_decay_steps=100, warm_up_steps=10, val_start=1e-6)

    def ref(n):
        # LambdaWarmUpCosineScheduler.schedule (warmup_cosine.py:37-53)
        if n < cfg.warm_up_steps:
            return (cfg.val_base - cfg.val_start) / cfg.warm_up_steps * n + cfg.val_start
        t = (n - cfg.warm_up_steps) / (cfg.max_decay_steps - cfg.warm_up_steps)
        t = min(t, 1.0)
        return cfg.val_final + 0.5 * (cfg.val_base - cfg.val_final) * (1 + math.cos(t * math.pi))

    for n in [0, 1, 5, 9, 10, 11, 50, 99, 100, 150]:
        got = float(warmup_cosine(jnp.asarray(n), cfg))
        np.testing.assert_allclose(got, ref(n), rtol=1e-5, atol=1e-10)


def test_split_step_matches_fused():
    cfg = tiny_cfg()
    batch_t = cfg.hop_length * cfg.num_frames
    rng = np.random.default_rng(7)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 1, batch_t)) * 0.3, jnp.float32),
        "lengths": jnp.asarray([batch_t, batch_t]),
    }
    s_fused = gan.create_train_state(jax.random.key(3), cfg)
    s_split = gan.create_train_state(jax.random.key(3), cfg)

    fused = jax.jit(gan.make_train_step(cfg))
    split = gan.make_train_step_split(cfg)

    s_fused, m_fused = fused(s_fused, batch)
    s_split, m_split = split(s_split, batch)

    assert int(s_split.step) == int(s_fused.step) == 1
    for k in ["train/generator/all", "train/discriminator/all", "lr"]:
        np.testing.assert_allclose(float(m_fused[k]), float(m_split[k]), rtol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(s_fused.gen_params), jax.tree.leaves(s_split.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_bf16_mixed_precision_train_step():
    cfg = tiny_cfg().replace(compute_dtype="bfloat16")
    state = gan.create_train_state(jax.random.key(0), cfg)
    step = jax.jit(gan.make_train_step(cfg))
    t = cfg.hop_length * cfg.num_frames
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 1, t)) * 0.3, jnp.float32),
        "lengths": jnp.asarray([t, t]),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train/generator/all"]))
    assert np.isfinite(float(metrics["train/discriminator/all"]))
    # Master params and optimizer state stay fp32.
    for leaf in jax.tree.leaves(state.gen_params):
        assert leaf.dtype == jnp.float32


def test_no_recompile_on_second_step():
    """Weak-typed init leaves once forced a full recompile at step 2 (the
    optimizer update strengthens them); assert step 1 and step 2 hit the same
    compiled executable."""
    from vocoder_tpu.models import vocos as vocos_mod
    from vocoder_tpu.models import convnext as convnext_mod

    cfg = tiny_cfg().replace(
        generator_name="vocos",
        generator=vocos_mod.VocosConfig(
            backbone=convnext_mod.ConvNeXtConfig(input_channels=8, depths=(1,), dims=(16,)),
            head=vocos_mod.ISTFTHeadConfig(dim=16, n_fft=16, hop_length=4, win_length=16),
        ),
    )
    state = gan.create_train_state(jax.random.key(0), cfg)
    step = jax.jit(gan.make_train_step(cfg))
    t = cfg.hop_length * cfg.num_frames
    batch = {
        "audio": jnp.zeros((2, 1, t), jnp.float32) + 0.1,
        "lengths": jnp.asarray([t, t]),
    }
    state, _ = step(state, batch)
    n_compiles = step._cache_size() if hasattr(step, "_cache_size") else None
    state, _ = step(state, batch)
    if n_compiles is not None:
        assert step._cache_size() == n_compiles, "train step recompiled at step 2"
    else:  # fallback: compare aval weak types before/after
        for leaf in jax.tree.leaves(state.gen_params):
            assert not getattr(leaf, "weak_type", False)


def test_bf16_loss_stft_trains_and_tracks_fp32():
    """task.loss_stft_dtype='bfloat16' relaxes only the loss-spectra framing/
    DFT dtype; the step must stay finite and the measured losses must track
    the fp32 step closely at init (same weights, same batch)."""
    cfg32 = tiny_cfg()
    cfg16 = cfg32.replace(loss_stft_dtype="bfloat16", spectral_precision="default")
    t = cfg32.hop_length * cfg32.num_frames
    rng = np.random.default_rng(5)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 1, t)) * 0.3, jnp.float32),
        "lengths": jnp.full((2,), t, jnp.int32),
    }
    s32 = gan.create_train_state(jax.random.key(0), cfg32)
    s16 = gan.create_train_state(jax.random.key(0), cfg16)
    _, m32 = jax.jit(gan.make_train_step(cfg32))(s32, batch)
    s16, m16 = jax.jit(gan.make_train_step(cfg16))(s16, batch)
    assert np.isfinite(float(m16["train/generator/all"]))
    # bf16 has ~3 decimal digits; loss magnitudes here are O(100)
    np.testing.assert_allclose(
        float(m16["train/generator/stft"]), float(m32["train/generator/stft"]), rtol=0.05
    )
    np.testing.assert_allclose(
        float(m16["train/generator/mel"]), float(m32["train/generator/mel"]), rtol=0.05
    )
    # and a second step runs on the updated params (grads flowed through bf16)
    s16, m16b = jax.jit(gan.make_train_step(cfg16))(s16, batch)
    assert np.isfinite(float(m16b["train/generator/all"])) and int(s16.step) == 2
