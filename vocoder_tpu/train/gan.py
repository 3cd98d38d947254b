"""The GAN training algorithm as ONE fused jit program.

Capability parity with /root/reference/fish_vocoder/models/gan.py:13-318
(GANModel with manual optimization): per step, the generator loss
``base + 2.5*(SC + mag MR-STFT) + 45*mel-L1 + mean_over_discs(LSGAN adv + FM)``
is computed with an on-device log-mel input transform, the generator is
updated (AdamW(0.8, 0.99, eps=1e-6) + warmup-cosine), then the discriminator
ensemble is updated on the SAME random crop with the fake audio
stop-gradient'ed, matching the reference's G-then-D ordering
(gan.py:234-280).  The crop-to-hop*32 trick before the discriminators
(gan.py:130-137) is a static-shape lax.dynamic_slice.

TPU-first: no host sync anywhere — the LR schedule, PRNG threading, random
crop, both optimizer updates and all metrics live inside the single jitted
step; the TrainState is donated so parameters update in place in HBM.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vocoder_tpu.losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    multi_resolution_stft_loss,
)
from vocoder_tpu.models import mpd, mrd
from vocoder_tpu.models.registry import get_generator
from vocoder_tpu.ops import linear_spectrogram, log_mel_spectrogram
from vocoder_tpu.train.schedule import WarmupCosineConfig, warmup_cosine

DEFAULT_RESOLUTIONS = ((2048, 512, 2048), (1024, 120, 600), (2048, 240, 1200), (4096, 480, 2400), (512, 50, 240))


@dataclasses.dataclass(frozen=True)
class GANTaskConfig:
    """Mirrors configs/model/gan.yaml composed with a resolution preset."""

    sampling_rate: int = 44100
    n_fft: int = 2048
    hop_length: int = 512
    win_length: int = 2048
    num_mels: int = 128

    generator_name: str = "hifigan"
    generator: Any = None  # generator config dataclass (frozen, hashable)

    mpd: mpd.MPDConfig = mpd.MPDConfig(periods=(3, 5, 7, 11, 17, 23, 37))
    mrd: mrd.MRDConfig = mrd.MRDConfig(resolutions=DEFAULT_RESOLUTIONS)
    stft_resolutions: tuple = DEFAULT_RESOLUTIONS  # tied to MRD (gan.yaml:57)

    num_frames: int = 128
    crop_length: int | None = 512 * 32  # hop * 32 (gan.yaml:13)
    input_transform: str = "mel"  # "mel" | "linear" (VAE/VQVAE)
    family: str = "gan"  # "gan" | "vae" | "vqvae" | "ssl" (models/{gan,vae}.py task classes + hifigan-vae.yaml)

    schedule: WarmupCosineConfig = WarmupCosineConfig()
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    adam_eps: float = 1e-6
    weight_decay: float = 0.01  # torch AdamW default

    stft_weight: float = 2.5
    mel_weight: float = 45.0

    # Mixed precision: params/optimizer state stay fp32; generator and
    # discriminator forward/backward run in bf16 (losses in fp32).  The
    # reference trains pure fp32/tf32 (trainer/default.yaml precision "32");
    # this is the TPU-native speed mode.
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # MXU precision of the loss-path DFT/mel matmuls (MR-STFT + mel-L1 +
    # input transform).  "highest" = 6-pass fp32 emulation (exact, default);
    # "high" = 3-pass (>= the reference's TF32 cuFFT-adjacent quality,
    # train.py:12-13 enables TF32); "default" = single-pass bf16.
    spectral_precision: str = "highest"  # "highest" | "high" | "default"
    # Waveform dtype entering the LOSS spectra (MR-STFT + mel-L1).  bfloat16
    # halves the loss-path framing/DFT HBM traffic (the ~8 ms/step
    # spectral_precision ablation target, BENCH.md); combine with
    # spectral_precision="default" for bf16 matmuls.  The generator/mel
    # INPUT transform always stays fp32 — only the loss measurement is
    # relaxed.  Measured A/B on the 60-step smoke before changing defaults.
    loss_stft_dtype: str = "float32"  # "float32" | "bfloat16"

    def replace(self, **kw) -> "GANTaskConfig":
        return dataclasses.replace(self, **kw)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any  # {"mpd": ..., "mrd": ...}
    opt_g: Any
    opt_d: Any
    rng: Any
    extra: Any = None  # non-gradient state (e.g. EMA VQ codebooks)


def make_optimizer(cfg: GANTaskConfig) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=lambda count: warmup_cosine(count, cfg.schedule),
        b1=cfg.adam_b1,
        b2=cfg.adam_b2,
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )


def create_train_state(key, cfg: GANTaskConfig) -> TrainState:
    kg, kmpd, kmrd, krng = jax.random.split(key, 4)
    extra = None
    if cfg.family == "gan":
        gen_params = get_generator(cfg.generator_name).init(kg, cfg.generator)
    elif cfg.family == "vae":
        from vocoder_tpu.models import vae as vae_mod

        gen_params = vae_mod.vae_init(kg, cfg.generator)
    elif cfg.family == "vqvae":
        from vocoder_tpu.models import vae as vae_mod

        gen_params, vq_state = vae_mod.vqvae_init(kg, cfg.generator)
        extra = {"vq": vq_state}
    elif cfg.family == "ssl":
        from vocoder_tpu.models import vae as vae_mod

        gen_params, vq_state = vae_mod.ssl_init(kg, cfg.generator)
        extra = {"vq": vq_state}
    else:
        raise ValueError(cfg.family)
    disc_params = {"mpd": mpd.init(kmpd, cfg.mpd), "mrd": mrd.init(kmrd, cfg.mrd)}
    # Strip weak types: a weak-typed leaf (e.g. from jnp.full with a python
    # scalar) becomes strong after the first optax update, changing the jit
    # cache key and recompiling the whole step at step 2.
    strip = lambda t: jax.tree.map(lambda x: jax.lax.convert_element_type(x, x.dtype), t)
    gen_params = strip(gen_params)
    disc_params = strip(disc_params)
    if extra is not None:
        extra = strip(extra)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        opt_g=tx.init(gen_params),
        opt_d=tx.init(disc_params),
        rng=krng,
        extra=extra,
    )


def model_param_specs(cfg: GANTaskConfig):
    """The generator's explicit tensor-parallel PartitionSpec tree, or None
    (then the per-leaf heuristic applies)."""
    if cfg.family != "gan":
        return None
    gd = get_generator(cfg.generator_name)
    return gd.param_specs(cfg.generator) if gd.param_specs is not None else None


def create_train_state_sharded(key, cfg: GANTaskConfig, mesh) -> TrainState:
    """Initialise the TrainState directly INTO the mesh layout (GSPMD init).

    jit with out_shardings materialises every leaf on its owning devices —
    the only correct path on multi-host (plain device_put cannot target
    non-addressable devices), and equivalent to create+shard on one host.
    Generators with explicit specs (vocos/vocos-huge Megatron MLP sharding)
    use them for params AND optimizer moments; the rest is heuristic.
    """
    from vocoder_tpu.parallel.mesh import train_state_specs

    abstract = jax.eval_shape(lambda k: create_train_state(k, cfg), key)
    shardings = train_state_specs(abstract, mesh, model_param_specs(cfg))
    return jax.jit(lambda k: create_train_state(k, cfg), out_shardings=shardings)(key)


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) -> (B, 1, T) float mask (utils/mask.py:4-10 + gan.py:238)."""
    idx = jnp.arange(max_length)[None, :]
    return (idx < lengths[:, None]).astype(jnp.float32)[:, None, :]


def spectral_precision(cfg: GANTaskConfig):
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[cfg.spectral_precision]


def input_transform(cfg: GANTaskConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio (B, T) -> input features (B, C, frames); gan.py:284."""
    if cfg.input_transform == "mel":
        return log_mel_spectrogram(
            audio,
            sample_rate=cfg.sampling_rate,
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            win_length=cfg.win_length,
            n_mels=cfg.num_mels,
            f_max=cfg.sampling_rate // 2,
            precision=spectral_precision(cfg),
        )
    if cfg.input_transform == "linear":
        return linear_spectrogram(
            audio, n_fft=cfg.n_fft, hop_length=cfg.hop_length, win_length=cfg.win_length,
            precision=spectral_precision(cfg),
        )
    raise ValueError(cfg.input_transform)


def loss_mel_transform(cfg: GANTaskConfig, audio: jnp.ndarray) -> jnp.ndarray:
    return log_mel_spectrogram(
        audio,
        sample_rate=cfg.sampling_rate,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        n_mels=cfg.num_mels,
        f_max=cfg.sampling_rate // 2,
        precision=spectral_precision(cfg),
    )


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree
    )


def _discs_apply(disc_params: dict, audio: jnp.ndarray, cfg: GANTaskConfig) -> dict:
    if cfg.compute_dtype == "bfloat16":
        disc_params = _cast_floats(disc_params, jnp.bfloat16)
        audio = audio.astype(jnp.bfloat16)
    outs = {
        "mpd": mpd.apply(disc_params["mpd"], audio, cfg.mpd),
        "mrd": mrd.apply(disc_params["mrd"], audio, cfg.mrd),
    }
    if cfg.compute_dtype == "bfloat16":
        outs = _cast_floats(outs, jnp.float32)  # losses accumulate in fp32
    return outs


def needs_template(cfg: GANTaskConfig) -> bool:
    """Whether the generator consumes an f0-derived template waveform
    (RefineGAN always, refinegan.py:287-299; HiFiGAN/BigVGAN when
    use_template=True, hifigan.py:171-204)."""
    return cfg.generator_name == "refinegan" or bool(getattr(cfg.generator, "use_template", False))


def generator_forward(
    gen_params,
    audio: jnp.ndarray,
    cfg: GANTaskConfig,
    *,
    training: bool,
    rng=None,
    input_spec=None,
    extra=None,
    template=None,
):
    """Family dispatch; returns (fake_audio, base_loss, new_extra, fwd_metrics).

    - "gan":   GANModel.forward parity (gan.py:282-288); base_loss 0.
    - "vae":   VAEModel.forward parity (vae.py:13-48): linear spec -> encoder ->
               chunk mean/logvar -> reparameterize (training) -> decoder; KL as base_loss.
    - "vqvae": VQVAEModel.forward parity (vae.py:80-109): encoder -> EMA-VQ ->
               decoder; length-fixed to within one hop; base_loss 0 (the
               reference comments out vq_loss*5), vq loss logged.
    """
    if cfg.family == "gan":
        gen = get_generator(cfg.generator_name)
        if input_spec is None:
            input_spec = input_transform(cfg, audio[:, 0, :])
        if needs_template(cfg) and template is None:
            raise ValueError(
                f"{cfg.generator_name} needs an f0 template waveform in the batch "
                "(data/f0.py builds it; the trainer wires it when needs_template(cfg))"
            )
        if cfg.compute_dtype == "bfloat16":
            gen_params = _cast_floats(gen_params, jnp.bfloat16)
            input_spec = input_spec.astype(jnp.bfloat16)
            if template is not None:
                template = template.astype(jnp.bfloat16)
        fake = gen.apply(gen_params, input_spec, cfg.generator, template=template, training=training, rng=rng)
        return fake.astype(jnp.float32), jnp.zeros(()), extra, {}

    from vocoder_tpu.models import vae as vae_mod

    if input_spec is None and cfg.family != "ssl":
        input_spec = input_transform(cfg, audio[:, 0, :])

    if cfg.family == "vae":
        latent = vae_mod.vae_encode(gen_params, input_spec, cfg.generator)
        l = cfg.generator.latent_size
        mean, logvar = latent[:, :l, :], latent[:, l:, :]
        if training:
            eps = jax.random.normal(rng, mean.shape, mean.dtype)
            z = mean + eps * jnp.exp(0.5 * logvar)
        else:
            z = mean
        fake = vae_mod.vae_decode(gen_params, z, cfg.generator, training=training)
        kl = 0.5 * jnp.mean(jnp.square(mean) + jnp.exp(logvar) - logvar - 1.0)
        return fake, kl, extra, {"train/generator/kl": kl}

    if cfg.family == "vqvae":
        latent = vae_mod.vqvae_encode(gen_params, input_spec, cfg.generator)
        from vocoder_tpu.models import vq as vq_mod

        quantized, _codes, vq_loss, new_vq = vq_mod.apply(
            extra["vq"], latent, cfg.generator.vq, training=training
        )
        fake = vae_mod.vqvae_decode(gen_params, quantized, cfg.generator, training=training)
        fake = _length_fix(fake, audio.shape[2], cfg.hop_length)
        new_extra = {**(extra or {}), "vq": new_vq}
        return fake, jnp.zeros(()), new_extra, {"train/generator/vq": vq_loss}

    if cfg.family == "ssl":
        # hifigan-vae semantic codec (configs/model/generator/hifigan-vae.yaml
        # via VQVAEModel semantics, ref models/vae.py:80-109): input_spec is
        # the HOST-extracted frozen-backbone features (batch["ssl_features"],
        # (B, T', hidden)); post-net + VQ + decoder train inside the jit step.
        if input_spec is None:
            raise ValueError(
                "ssl family needs host-side backbone features in the batch "
                "(batch['ssl_features']; the trainer wires a HubertFeatureExtractor)"
            )
        from vocoder_tpu.models import vq as vq_mod

        latent = vae_mod.ssl_encode(gen_params, input_spec, cfg.generator)
        quantized, _codes, vq_loss, new_vq = vq_mod.apply(
            extra["vq"], latent, cfg.generator.vq, training=training
        )
        fake = vae_mod.ssl_decode(gen_params, quantized, cfg.generator, training=training)
        fake = _length_fix(fake, audio.shape[2], cfg.hop_length)
        new_extra = {**(extra or {}), "vq": new_vq}
        return fake, jnp.zeros(()), new_extra, {"train/generator/vq": vq_loss}

    raise ValueError(cfg.family)


def _length_fix(fake: jnp.ndarray, t_audio: int, hop: int) -> jnp.ndarray:
    """Codec output length drift <= one hop gets sliced/padded (vae.py:89-96)."""
    t_f = fake.shape[2]
    assert abs(t_f - t_audio) <= hop, (t_f, t_audio)
    if t_f > t_audio:
        return fake[:, :, :t_audio]
    if t_f < t_audio:
        return jnp.pad(fake, ((0, 0), (0, 0), (0, t_audio - t_f)))
    return fake


def _generator_loss(gen_params, disc_params, audio, mask, cfg: GANTaskConfig, rng, extra, template=None, input_spec=None):
    r_crop, r_model = jax.random.split(rng)
    fake, base_loss, new_extra, fwd_metrics = generator_forward(
        gen_params, audio, cfg, training=True, rng=r_model, extra=extra, template=template, input_spec=input_spec
    )
    assert fake.shape == audio.shape, (fake.shape, audio.shape)

    audio_m = audio * mask
    fake_m = fake * mask

    loss_dt = jnp.bfloat16 if cfg.loss_stft_dtype == "bfloat16" else jnp.float32
    audio_l = audio_m[:, 0].astype(loss_dt)
    fake_l = fake_m[:, 0].astype(loss_dt)
    sc_loss, mag_loss = multi_resolution_stft_loss(
        fake_l, audio_l, cfg.stft_resolutions, spectral_precision(cfg)
    )
    loss_stft = sc_loss + mag_loss

    audio_mel = loss_mel_transform(cfg, audio_l)
    fake_mel = loss_mel_transform(cfg, fake_l)
    loss_mel = jnp.mean(jnp.abs(audio_mel.astype(jnp.float32) - fake_mel.astype(jnp.float32)))

    # Crop before the discriminators to bound their cost (gan.py:130-137).
    t = audio.shape[2]
    if cfg.crop_length is not None and t > cfg.crop_length:
        start = jax.random.randint(r_crop, (), 0, t - cfg.crop_length)
        audio_c = jax.lax.dynamic_slice_in_dim(audio_m, start, cfg.crop_length, axis=2)
        fake_c = jax.lax.dynamic_slice_in_dim(fake_m, start, cfg.crop_length, axis=2)
    else:
        audio_c, fake_c = audio_m, fake_m

    metrics = dict(fwd_metrics)
    loss_adv_all = 0.0
    fake_outs = _discs_apply(disc_params, fake_c, cfg)
    real_outs = _discs_apply(disc_params, audio_c, cfg)
    for key in fake_outs:
        score_fakes, feat_fake = fake_outs[key]
        _, feat_real = real_outs[key]
        loss_fake = generator_adversarial_loss(score_fakes)
        loss_fm = feature_matching_loss(feat_real, feat_fake)
        metrics[f"train/generator/adv_{key}"] = loss_fake
        metrics[f"train/generator/adv_fm_{key}"] = loss_fm
        loss_adv_all = loss_adv_all + loss_fake + loss_fm
    loss_adv_all = loss_adv_all / len(fake_outs)

    loss_gen_all = base_loss + loss_stft * cfg.stft_weight + loss_mel * cfg.mel_weight + loss_adv_all
    metrics.update(
        {
            "train/generator/stft": loss_stft,
            "train/generator/mel": loss_mel,
            "train/generator/base": base_loss,
            "train/generator/all": loss_gen_all,
        }
    )
    return loss_gen_all, (metrics, audio_c, fake_c, new_extra)


def _discriminator_loss_fn(disc_params, audio_c, fake_c, cfg: GANTaskConfig):
    real_outs = _discs_apply(disc_params, audio_c, cfg)
    fake_outs = _discs_apply(disc_params, jax.lax.stop_gradient(fake_c), cfg)
    metrics = {}
    loss_all = 0.0
    for key in real_outs:
        scores, _ = real_outs[key]
        score_fakes, _ = fake_outs[key]
        loss = discriminator_loss(scores, score_fakes)
        metrics[f"train/discriminator/{key}"] = loss
        loss_all = loss_all + loss
    loss_all = loss_all / len(real_outs)
    metrics["train/discriminator/all"] = loss_all
    return loss_all, metrics


def make_train_step_split(cfg: GANTaskConfig):
    """G and D phases as two separately-jitted programs.

    Semantically identical to the fused step (same ordering, same crop, fake
    stop-gradient'ed into D).  Exists because one fused fwd+bwd over the
    generator AND the 12-discriminator ensemble is a very large XLA program;
    on build hosts with constrained compiler memory the two halves compile
    where the single program cannot.  Prefer the fused step elsewhere.
    """
    tx = make_optimizer(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def g_phase(state: TrainState, batch: dict):
        audio, lengths = batch["audio"], batch["lengths"]
        mask = sequence_mask(lengths, audio.shape[2])
        rng, step_rng = jax.random.split(state.rng)
        (loss_g, (g_metrics, audio_c, fake_c, new_extra)), grads_g = jax.value_and_grad(
            _generator_loss, has_aux=True
        )(
            state.gen_params, state.disc_params, audio, mask, cfg, step_rng, state.extra,
            batch.get("template"), batch.get("ssl_features"),
        )
        updates_g, opt_g = tx.update(grads_g, state.opt_g, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates_g)
        g_metrics["train/generator/grad_norm"] = optax.global_norm(grads_g)
        g_metrics["lr"] = warmup_cosine(state.step, cfg.schedule)
        state = state.replace(gen_params=gen_params, opt_g=opt_g, rng=rng, extra=new_extra)
        return state, g_metrics, audio_c, fake_c

    @functools.partial(jax.jit, donate_argnums=(0,))
    def d_phase(state: TrainState, audio_c, fake_c):
        (loss_d, d_metrics), grads_d = jax.value_and_grad(_discriminator_loss_fn, has_aux=True)(
            state.disc_params, audio_c, fake_c, cfg
        )
        updates_d, opt_d = tx.update(grads_d, state.opt_d, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates_d)
        for key in grads_d:
            d_metrics[f"train/discriminator/grad_norm_{key}"] = optax.global_norm(grads_d[key])
        state = state.replace(step=state.step + 1, disc_params=disc_params, opt_d=opt_d)
        return state, d_metrics

    def step(state: TrainState, batch: dict):
        state, g_metrics, audio_c, fake_c = g_phase(state, batch)
        state, d_metrics = d_phase(state, audio_c, fake_c)
        return state, {**g_metrics, **d_metrics}

    # Exposed so cli/bench_train times THE programs training runs, not a copy.
    step.g_phase = g_phase
    step.d_phase = d_phase
    return step


def make_train_step(cfg: GANTaskConfig):
    """Build the fused G+D train step: (state, batch) -> (state, metrics)."""
    tx = make_optimizer(cfg)

    def step(state: TrainState, batch: dict):
        audio, lengths = batch["audio"], batch["lengths"]
        mask = sequence_mask(lengths, audio.shape[2])

        rng, step_rng = jax.random.split(state.rng)

        # ---- Generator phase (gan.py:240-255) ----
        (loss_g, (g_metrics, audio_c, fake_c, new_extra)), grads_g = jax.value_and_grad(
            _generator_loss, has_aux=True
        )(
            state.gen_params, state.disc_params, audio, mask, cfg, step_rng, state.extra,
            batch.get("template"), batch.get("ssl_features"),
        )
        updates_g, opt_g = tx.update(grads_g, state.opt_g, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates_g)
        g_metrics["train/generator/grad_norm"] = optax.global_norm(grads_g)

        # ---- Discriminator phase (gan.py:257-275), fake from pre-update G ----
        (loss_d, d_metrics), grads_d = jax.value_and_grad(_discriminator_loss_fn, has_aux=True)(
            state.disc_params, audio_c, fake_c, cfg
        )
        updates_d, opt_d = tx.update(grads_d, state.opt_d, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, updates_d)
        for key in grads_d:
            d_metrics[f"train/discriminator/grad_norm_{key}"] = optax.global_norm(grads_d[key])

        metrics = {**g_metrics, **d_metrics}
        metrics["lr"] = warmup_cosine(state.step, cfg.schedule)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            opt_g=opt_g,
            opt_d=opt_d,
            rng=rng,
            extra=new_extra,
        )
        return new_state, metrics

    return step


def make_eval_step(cfg: GANTaskConfig):
    """Validation: masked mel-L1 on the full clip (gan.py:290-315)."""

    def step(state: TrainState, batch: dict):
        audio, lengths = batch["audio"], batch["lengths"]
        mask = sequence_mask(lengths, audio.shape[2])
        fake, _, _, _ = generator_forward(
            state.gen_params, audio, cfg, training=False, extra=state.extra,
            template=batch.get("template"), input_spec=batch.get("ssl_features")
        )
        audio_m, fake_m = audio * mask, fake * mask
        loss_mel = jnp.mean(
            jnp.abs(loss_mel_transform(cfg, audio_m[:, 0]) - loss_mel_transform(cfg, fake_m[:, 0]))
        )
        return {"val/metrics/mel": loss_mel}, fake_m

    return step
