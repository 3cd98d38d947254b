"""Typed configuration system.

The functional analogue of the reference's Hydra composition tree
(fish_vocoder/configs/**, SURVEY.md §5.6): the same group axes — resolution x
generator x model-family x data — as typed Python presets with dotted-path
CLI overrides (``key.sub=value``), replacing ``${...}`` interpolation with
plain construction-time wiring.
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Any

from vocoder_tpu.models import convnext, hifigan, mpd, mrd, vocos
from vocoder_tpu.train.gan import GANTaskConfig
from vocoder_tpu.train.schedule import WarmupCosineConfig

# --------------------------------------------------------------------------
# Resolution presets (configs/model/resolution/*.yaml)
# --------------------------------------------------------------------------

RESOLUTIONS: dict[str, dict] = {
    "44100_512_2048": dict(sampling_rate=44100, num_mels=128, n_fft=2048, hop_length=512, win_length=2048),
    "24000_256_1024": dict(sampling_rate=24000, num_mels=100, n_fft=1024, hop_length=256, win_length=1024),
    "24000_2048_3072": dict(sampling_rate=24000, num_mels=100, n_fft=3072, hop_length=2048, win_length=3072),
    # The ssl/hifigan-vae semantic codec runs at 16 kHz with 40 ms frames
    # (decoder hop 640 = 2x the HuBERT stride; hifigan-vae.yaml:10-11).
    "16000_640_2048": dict(sampling_rate=16000, num_mels=128, n_fft=2048, hop_length=640, win_length=2048),
}


def _mrd_resolutions(res: dict) -> tuple:
    # configs/model/gan.yaml:46-53: model resolution first, then fixed set.
    return (
        (res["n_fft"], res["hop_length"], res["win_length"]),
        (1024, 120, 600),
        (2048, 240, 1200),
        (4096, 480, 2400),
        (512, 50, 240),
    )


# --------------------------------------------------------------------------
# Generator presets (configs/model/generator/*.yaml)
# --------------------------------------------------------------------------


# Upsample-rate factorizations per hop length (prod(rates) == hop asserted by
# the generators, hifigan.py:154-156).  512 matches the shipped hifigan.yaml.
_UPSAMPLE_PRESETS = {
    512: ((8, 8, 2, 2, 2), (16, 16, 8, 2, 2)),
    256: ((8, 8, 2, 2), (16, 16, 4, 4)),
    2048: ((8, 8, 4, 4, 2), (16, 16, 8, 8, 4)),
    640: ((8, 5, 4, 2, 2), (16, 10, 8, 4, 4)),  # hifigan-vae.yaml decoder
}


def upsample_rates_for_hop(hop: int) -> tuple[tuple, tuple]:
    if hop in _UPSAMPLE_PRESETS:
        return _UPSAMPLE_PRESETS[hop]
    # Greedy factorization fallback: rates of 8/5/4/3/2, kernel = 2*rate.
    rates = []
    rem = hop
    for f in (8, 5, 4, 3, 2):
        while rem % f == 0 and rem > 1:
            rates.append(f)
            rem //= f
    assert rem == 1, f"cannot factor hop {hop}"
    return tuple(rates), tuple(2 * r for r in rates)


def _gen_hifigan(res: dict):
    rates, kernels = upsample_rates_for_hop(res["hop_length"])
    return "hifigan", hifigan.HiFiGANConfig(
        hop_length=res["hop_length"],
        upsample_rates=rates,
        upsample_kernel_sizes=kernels,
        num_mels=res["num_mels"],
        use_template=False,
    )


def _gen_vocos(res: dict):
    return "vocos", vocos.VocosConfig.base(
        num_mels=res["num_mels"], n_fft=res["n_fft"], hop_length=res["hop_length"], win_length=res["win_length"]
    )


def _gen_vocos_huge(res: dict):
    return "vocos", vocos.VocosConfig.huge(
        num_mels=res["num_mels"], n_fft=res["n_fft"], hop_length=res["hop_length"], win_length=res["win_length"]
    )


def _gen_bigvgan(res: dict):
    from vocoder_tpu.models import bigvgan

    rates, kernels = upsample_rates_for_hop(res["hop_length"])
    return "bigvgan", bigvgan.BigVGANConfig(
        hop_length=res["hop_length"],
        upsample_rates=rates,
        upsample_kernel_sizes=kernels,
        num_mels=res["num_mels"],
        use_template=False,
    )


def _gen_refinegan(res: dict):
    from vocoder_tpu.models import refinegan

    return "refinegan", refinegan.RefineGANConfig(
        sampling_rate=res["sampling_rate"], hop_length=res["hop_length"], num_mels=res["num_mels"]
    )


def _gen_firefly(res: dict):
    # configs/model/generator/firefly-gan-base.yaml: ConvNeXt backbone +
    # HiFiGAN head via the Unify composition.
    from vocoder_tpu.models import firefly

    return "firefly_gan_base", firefly.FireflyConfig(
        backbone=convnext.ConvNeXtConfig(
            input_channels=res["num_mels"], depths=(3, 3, 9, 3), dims=(128, 256, 384, 512), drop_path_rate=0.2
        ),
        head=hifigan.HiFiGANConfig(
            hop_length=res["hop_length"],
            upsample_rates=(8, 8, 2, 2, 2),
            upsample_kernel_sizes=(16, 16, 4, 4, 4),
            num_mels=512,
            upsample_initial_channel=512,
            use_template=False,
            pre_conv_kernel_size=13,
            post_conv_kernel_size=13,
        ),
    )


def _gen_vocos_small(res: dict):
    # The reference's vocos-small.yaml cannot instantiate (drift D1: missing
    # VocosGenerator + wrong kwarg); this is the working equivalent of its
    # intent: a single-stage depth-8 dim-512 ConvNeXt + iSTFT head.
    return "vocos", vocos.VocosConfig(
        backbone=convnext.ConvNeXtConfig(
            input_channels=res["num_mels"], depths=(8,), dims=(512,), drop_path_rate=0.1
        ),
        head=vocos.ISTFTHeadConfig(
            dim=512, n_fft=res["n_fft"], hop_length=res["hop_length"], win_length=res["win_length"]
        ),
    )


GENERATOR_PRESETS = {
    "hifigan": _gen_hifigan,
    "vocos": _gen_vocos,
    "vocos_small": _gen_vocos_small,
    "vocos_huge": _gen_vocos_huge,
    "bigvgan": _gen_bigvgan,
    "refinegan": _gen_refinegan,
    "firefly_gan_base": _gen_firefly,
}


# --------------------------------------------------------------------------
# Data / run configs
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """configs/data/vocoder.yaml analogue."""

    train_roots: tuple = ()  # (path, prob) pairs or bare paths
    train_probs: tuple = ()
    val_root: str | None = None
    batch_size: int = 16
    val_batch_size: int = 2
    val_crop_frames: int = 1000
    num_workers: int = 4  # decode/augment worker threads (naive.py:34-72 analogue)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """trainer/default.yaml + callbacks/default.yaml analogue."""

    max_steps: int = 10_000_000
    val_interval: int = 5000
    ckpt_interval: int = 20_000
    log_interval: int = 100
    seed: int = 594461
    model_parallel: int = 1
    data_parallel: int | None = None  # None -> n_devices // model_parallel
    precision: str = "highest"  # "highest" (fp32 parity) | "default" (fast)
    ckpt_path: str | None = None
    resume_weights_only: bool = False
    workdir: str = "logs/train"
    profile_steps: tuple | None = None  # (start, stop) -> jax.profiler trace into workdir/profile
    early_stop_patience: int | None = None  # validations without val-mel improvement (callbacks/early_stopping.yaml)
    val_pesq: bool = True  # host-side val PESQ-WB via native P.862 (ref models/vocoder.py:40-46)
    split_step: bool = False  # compile G/D phases separately (compile-memory-limited hosts)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    task: GANTaskConfig
    data: DataConfig = DataConfig()
    run: RunConfig = RunConfig()


def _vae_generator(res: dict):
    """VAEModel composition (models/vae.py:7-48): ConvNeXt encoder over the
    linear spectrogram emitting 2*latent channels; HiFiGAN decoder."""
    from vocoder_tpu.models.vae import VAEGeneratorConfig

    latent = 256  # configs/model/vae.yaml:8
    bins = res["n_fft"] // 2 + 1
    rates, kernels = upsample_rates_for_hop(res["hop_length"])
    return VAEGeneratorConfig(
        latent_size=latent,
        encoder_kind="convnext",
        encoder=convnext.ConvNeXtConfig(
            input_channels=bins, depths=(3, 3, 9, 3), dims=(128, 256, 384, 2 * latent), drop_path_rate=0.2
        ),
        decoder=hifigan.HiFiGANConfig(
            hop_length=res["hop_length"],
            upsample_rates=rates,
            upsample_kernel_sizes=kernels,
            num_mels=latent,
            upsample_initial_channel=512,
            use_template=False,
        ),
    )


def _vqvae_generator(res: dict):
    """VQVAEModel composition (models/vae.py:51-109 + configs/model/vqvae.yaml):
    WaveNet posterior encoder over the linear spectrogram, EMA-VQ, HiFiGAN decoder."""
    from vocoder_tpu.models import vq as vq_mod, wavenet
    from vocoder_tpu.models.vae import VQVAEGeneratorConfig

    latent = 512  # vqvae.yaml:12
    bins = res["n_fft"] // 2 + 1
    rates, kernels = upsample_rates_for_hop(res["hop_length"])
    return VQVAEGeneratorConfig(
        latent_size=latent,
        encoder=wavenet.PosteriorEncoderConfig(
            in_channels=bins, out_channels=latent, hidden_channels=256, n_layers=16, mode="vqvae"
        ),
        decoder=hifigan.HiFiGANConfig(
            hop_length=res["hop_length"],
            upsample_rates=rates,
            upsample_kernel_sizes=kernels,
            num_mels=latent,
            upsample_initial_channel=512,
            use_template=False,
        ),
        vq=vq_mod.VQConfig(dim=latent, codebook_size=4096, num_quantizers=1),  # vqvae.yaml:10-11
    )


def _ssl_generator(res: dict):
    """hifigan-vae.yaml:1-18 composition: frozen HuBERT -> trainable post-net
    -> EMA-VQ (vqvae.yaml bottleneck) -> HiFiGAN decoder at hop 640."""
    from vocoder_tpu.models import vq as vq_mod
    from vocoder_tpu.models.ssl_encoders import HubertEncoderConfig
    from vocoder_tpu.models.vae import SSLCodecGeneratorConfig

    latent = 512  # hifigan-vae.yaml:7 output_size / decoder num_mels
    rates, kernels = upsample_rates_for_hop(res["hop_length"])
    return SSLCodecGeneratorConfig(
        latent_size=latent,
        hubert=HubertEncoderConfig(output_size=latent),
        decoder=hifigan.HiFiGANConfig(
            hop_length=res["hop_length"],
            upsample_rates=rates,
            upsample_kernel_sizes=kernels,
            num_mels=latent,
            upsample_initial_channel=512,
            use_template=False,
        ),
        vq=vq_mod.VQConfig(dim=latent, codebook_size=4096, num_quantizers=1),
    )


def build_task_config(model: str = "hifigan", resolution: str = "44100_512_2048", family: str = "gan") -> GANTaskConfig:
    # CLI convenience: accept `vocos-huge` for `vocos_huge` etc.
    model = model.replace("-", "_")
    res = RESOLUTIONS[resolution]
    mrd_res = _mrd_resolutions(res)
    kw: dict = {}
    if family == "gan":
        if model not in GENERATOR_PRESETS:
            raise KeyError(f"unknown generator preset {model!r}; available: {sorted(GENERATOR_PRESETS)}")
        gen_name, gen_cfg = GENERATOR_PRESETS[model](res)
    elif family == "vae":
        gen_name, gen_cfg = "vae", _vae_generator(res)
    elif family == "vqvae":
        gen_name, gen_cfg = "vqvae", _vqvae_generator(res)
        # vqvae.yaml:13-27: smaller crops + reduced discriminators.
        mrd_res = mrd_res[:4]
        kw = dict(mpd=mpd.MPDConfig(periods=(2, 3, 5, 7, 11)), num_frames=32)
    elif family == "ssl":
        gen_name, gen_cfg = "ssl", _ssl_generator(res)
        # Same memory-reduction choices as the vqvae task it trains through.
        mrd_res = mrd_res[:4]
        kw = dict(mpd=mpd.MPDConfig(periods=(2, 3, 5, 7, 11)), num_frames=32)
    else:
        raise ValueError(family)
    return GANTaskConfig(
        sampling_rate=res["sampling_rate"],
        n_fft=res["n_fft"],
        hop_length=res["hop_length"],
        win_length=res["win_length"],
        num_mels=res["num_mels"],
        generator_name=gen_name,
        generator=gen_cfg,
        mrd=mrd.MRDConfig(resolutions=mrd_res),
        stft_resolutions=mrd_res,
        crop_length=res["hop_length"] * 32,
        input_transform="mel" if family == "gan" else "linear",
        family=family,
        schedule=WarmupCosineConfig(val_base=1e-4, val_final=0.0, max_decay_steps=5_000_000),
        **({"mpd": mpd.MPDConfig(periods=(3, 5, 7, 11, 17, 23, 37)), "num_frames": 128} | kw),
    )


def build_train_config(model="hifigan", resolution="44100_512_2048", family="gan", overrides=()) -> TrainConfig:
    cfg = TrainConfig(task=build_task_config(model, resolution, family))
    return apply_overrides(cfg, overrides)


# --------------------------------------------------------------------------
# Dotted overrides ("a.b.c=value")
# --------------------------------------------------------------------------


def _parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


class _Leaf:
    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


def _apply_tree(obj, tree: dict):
    """Apply a nested override tree with ONE replace per dataclass, so sibling
    fields change together — invariants spanning fields (e.g. HiFiGAN's
    prod(upsample_rates) == hop_length, checked in __post_init__) stay
    satisfiable from the CLI."""
    changes = {}
    for key, node in tree.items():
        if isinstance(node, _Leaf):
            changes[key] = node.value
        else:
            if dataclasses.is_dataclass(obj):
                cur = getattr(obj, key)
            elif isinstance(obj, dict):
                cur = obj[key]
            else:
                raise TypeError(f"cannot descend into {type(obj)} at {key!r}")
            changes[key] = _apply_tree(cur, node)
    if dataclasses.is_dataclass(obj):
        return dataclasses.replace(obj, **changes)
    if isinstance(obj, dict):
        return {**obj, **changes}
    raise TypeError(f"cannot apply overrides {list(tree)} to {type(obj)}")


def apply_overrides(cfg, overrides) -> Any:
    tree: dict = {}
    for ov in overrides:
        key, eq, raw = ov.partition("=")
        assert eq == "=", f"override must be key=value, got {ov!r}"
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            assert isinstance(node, dict), f"override {key!r} conflicts with an earlier leaf"
        # Reject the reverse-order conflict too (`a.b.c=2 a.b=1` would silently
        # drop the deeper override by replacing the subtree with a leaf).
        assert not isinstance(node.get(parts[-1]), dict), (
            f"override {key!r} conflicts with an earlier deeper override"
        )
        node[parts[-1]] = _Leaf(_parse_value(raw))
    return _apply_tree(cfg, tree) if tree else cfg


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


def overlay_task_config(template, d: dict):
    """Recursively `dataclasses.replace` a task-config template with values
    from a config.json-style asdict() tree (lists coerced back to tuples,
    keys unknown to the current schema ignored — forward compatible).

    Used by cli/infer.py to reproduce the EXACT task config a checkpoint was
    trained with (including dotted overrides the preset alone cannot express);
    the --model preset supplies the template so nested generator/discriminator
    config classes are recovered by type."""
    import dataclasses as _dc

    kw = {}
    for f in _dc.fields(type(template)):
        if f.name not in d:
            continue
        v = d[f.name]
        cur = getattr(template, f.name)
        if _dc.is_dataclass(cur) and isinstance(v, dict):
            kw[f.name] = overlay_task_config(cur, v)
        else:
            kw[f.name] = _tuplify(v)
    return _dc.replace(template, **kw)
