"""BigVGAN generator, TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/generators/
bigvgan.py:18-379: the HiFiGAN upsample skeleton with Snake/SnakeBeta
periodic activations (x + (1/b)*sin^2(a*x), per-channel trainable, optional
log-scale), every activation wrapped in anti-aliased 2x up/act/2x down FIRs
(ops/antialias.py), AMP resblocks (6 convs + 6 anti-aliased activations), a
per-(upsample, kernel) resblock grid averaged in forward, and the optional
f0-template path.
"""

from __future__ import annotations

import dataclasses
import os as _os
from math import prod

import jax
import jax.numpy as jnp

from vocoder_tpu import nn
from vocoder_tpu.convert import _np, conv1d_from_torch, conv_transpose1d_from_torch
from vocoder_tpu.ops.antialias import downsample1d, upsample1d


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    hop_length: int = 512
    upsample_rates: tuple = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 8, 2, 2)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 128
    upsample_initial_channel: int = 512
    activation: str = "snakebeta"  # "snake" | "snakebeta"
    snake_logscale: bool = True
    use_template: bool = False
    pre_conv_kernel_size: int = 7
    post_conv_kernel_size: int = 7
    checkpointing: bool = False

    def __post_init__(self):
        assert prod(self.upsample_rates) == self.hop_length


def _snake_init(channels: int, kind: str, logscale: bool) -> dict:
    # log-scale -> zeros (exp() == 1), linear -> ones (bigvgan.py:51-54,110-115).
    val = jnp.zeros if logscale else jnp.ones
    p = {"alpha": val((channels,))}
    if kind == "snakebeta":
        p["beta"] = val((channels,))
    return p


def _snake_apply(p: dict, x: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    alpha = p["alpha"]
    beta = p.get("beta", alpha)
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    from vocoder_tpu.ops.antialias import sin_sq

    return x + (1.0 / (beta + 1e-9)) * sin_sq(x * alpha)


# Anti-aliased activation backend for the UNFOLDED (fold == 1) stages — with
# the folded tail active these are only the C >= 128 stages.  All backends
# are numerically equivalent:
#   "auto"      — poly4 everywhere (default).  Round 2 measured the pallas
#                 kernel winning at inference on the then-unfolded pipeline
#                 (422 vs 517 ms); with the folded tail the r3 profile showed
#                 the kernel's custom-call boundaries forcing memory-space
#                 copies on the C>=128 stages, and the re-measured A/B flips:
#                 poly4 210.8 ms vs pallas-auto 234.3 ms (b16 inference).
#   "pallas"    — ops/pallas/aa_snake.py fused VMEM kernel (lane-folded
#                 polyphase, one HBM pass)
#   "polyphase" — ops/antialias.aa_snake_polyphase: fused-branch depthwise
#                 correlations, custom-VJP backward
#   "poly4"     — four plain depthwise convs, XLA autodiff (fastest in BOTH
#                 training — autodiff saves the pre-activations — and, post-
#                 fold, inference)
#   "compose"   — up(2x) FIR -> snake -> down(2x) FIR (the reference
#                 alias_free_torch structure): 677 ms
AA_BACKEND = _os.environ.get("VOCODER_AA_BACKEND", "auto")
if AA_BACKEND not in ("auto", "pallas", "polyphase", "poly4", "compose"):
    raise ValueError(
        f"VOCODER_AA_BACKEND={AA_BACKEND!r} is not a known backend; expected "
        "one of 'auto' (default), 'pallas', 'polyphase', 'poly4', 'compose'"
    )

# Small-channel tail stages keep activations time-folded (B, T/r, r*C) with
# r*C = 128 — see models/hifigan.py TAIL_FOLD for the rationale (XLA pads a
# C<128 minor dim to the 128-lane tile, wasting 4-8x VPU + HBM on every
# elementwise op; BigVGAN's anti-aliased snakes are almost all elementwise,
# so unlike HiFiGAN the fold wins at inference too and "auto" is not
# training-gated).  When folded, the activation runs as
# ops/antialias.aa_snake_poly4_folded.
TAIL_FOLD = "auto"  # "auto" | "on" | "off"

# Backend for the FOLDED aa-snake (fold > 1 stages):
#   "xla"    — ops/antialias.aa_snake_poly4_folded: four dense (rC, rC)
#              folded depthwise convs on the MXU (structural-zero FLOPs) +
#              snake; the round-2 measured default (236 ms b16 inference).
#   "pallas" — ops/pallas/aa_snake.fused_aa_snake on the (free) unfolded
#              view: the kernel lane-folds internally to the SAME (T/r, 128)
#              layout, so in the folded pipeline there is no re-tiling on
#              either side; it does the true 6-tap math (no structural-zero
#              MXU work) in ONE HBM pass.  Inference-forward only (training
#              keeps XLA: the kernel call blocks conv-gradient fusion,
#              measured round 2).
# Default from $VOCODER_AA_FOLDED_BACKEND so the TPU bench can A/B it in one
# command; stays "xla" until the pallas path measures faster on hardware.
AA_FOLDED_BACKEND = _os.environ.get("VOCODER_AA_FOLDED_BACKEND", "xla")  # "xla" | "pallas"
if AA_FOLDED_BACKEND not in ("xla", "pallas"):
    raise ValueError(
        f"VOCODER_AA_FOLDED_BACKEND={AA_FOLDED_BACKEND!r} is not a known "
        "backend; expected 'xla' (default) or 'pallas'"
    )

# Whole-AMP-STAGE fused Pallas kernel (ops/pallas/amp_block.py): all resblock
# kernel sizes, dilations, residuals and the 1/n_k average in ONE HBM pass
# per stage, inference only.  "fused" enables it for every supported stage:
# r*C == 128 lane-dense stages run one all-blocks kernel, the wide C == 256
# first stage one kernel per block (VMEM); "xla" keeps the per-op folded
# pipeline.  Measured r4 (BENCH.md): 113.5 vs 117.0 ms b16 inference with
# the poly-sin snake.
AMP_BACKEND = _os.environ.get("VOCODER_AMP_BACKEND", "fused")  # "fused" | "xla"
if AMP_BACKEND not in ("fused", "xla"):
    raise ValueError(
        f"VOCODER_AMP_BACKEND={AMP_BACKEND!r} is not a known backend; "
        "expected 'fused' (default) or 'xla'"
    )


def _fold_active() -> bool:
    if TAIL_FOLD == "off":
        return False
    if TAIL_FOLD == "on":
        return True
    return jax.default_backend() == "tpu"


def _aa_snake(p: dict, x: jnp.ndarray, logscale: bool, training: bool = False, fold: int = 1, lens=None) -> jnp.ndarray:
    """Anti-aliased activation: 2x upsample -> snake -> 2x downsample."""
    alpha = p["alpha"]
    beta = p.get("beta", alpha)
    if lens is not None:
        from vocoder_tpu.ops.antialias import aa_snake_poly4_masked

        return aa_snake_poly4_masked(x, alpha, beta, logscale, lens)
    if fold > 1:
        if AA_FOLDED_BACKEND == "pallas" and not training and jax.default_backend() != "cpu":
            from vocoder_tpu.ops.pallas.aa_snake import fused_aa_snake

            b, rows, rc = x.shape
            c = rc // fold
            # Unfold is free (C minor, row-major); the kernel re-folds to the
            # identical (rows, 128) tiling internally.
            zu = fused_aa_snake(x.reshape(b, rows * fold, c), alpha, beta, logscale)
            return zu.reshape(b, rows, rc)
        from vocoder_tpu.ops.antialias import aa_snake_poly4_folded

        return aa_snake_poly4_folded(x, alpha, beta, logscale, fold)
    backend = AA_BACKEND
    if backend == "auto":
        backend = "poly4"  # fastest measured in both training and (post-fold) inference
    if backend == "polyphase":
        from vocoder_tpu.ops.antialias import aa_snake_polyphase

        return aa_snake_polyphase(x, alpha, beta, logscale)
    if backend == "poly4":
        from vocoder_tpu.ops.antialias import aa_snake_poly4

        return aa_snake_poly4(x, alpha, beta, logscale)
    if backend == "pallas" and jax.default_backend() != "cpu":
        from vocoder_tpu.ops.pallas.aa_snake import fused_aa_snake

        return fused_aa_snake(x, alpha, beta, logscale)
    return downsample1d(_snake_apply(p, upsample1d(x, 2), logscale), 2)


def _amp_init(key, channels: int, kernel_size: int, dilations: tuple, cfg: BigVGANConfig) -> dict:
    keys = jax.random.split(key, 2 * len(dilations))
    convs1 = [
        nn.conv1d_init(keys[2 * i], channels, channels, kernel_size, weight_norm=True, init="normal")
        for i in range(len(dilations))
    ]
    convs2 = [
        nn.conv1d_init(keys[2 * i + 1], channels, channels, kernel_size, weight_norm=True, init="normal")
        for i in range(len(dilations))
    ]
    acts = [_snake_init(channels, cfg.activation, cfg.snake_logscale) for _ in range(2 * len(dilations))]
    return {"convs1": convs1, "convs2": convs2, "activations": acts}


_len_mask = nn.length_mask

# Tensor-parallel width gate, shared with models/hifigan.py (same skeleton,
# same rationale: only stages carrying >= one full 128-lane tile per device
# shard; narrower stages are the time-folded region and replicate).
_TP_MIN_CHANNELS = 128


def _amp_apply(p: dict, x: jnp.ndarray, kernel_size: int, dilations: tuple, cfg: BigVGANConfig, training: bool = False, fold: int = 1, lens=None) -> jnp.ndarray:
    from vocoder_tpu.parallel import shard_channels

    acts1 = p["activations"][::2]
    acts2 = p["activations"][1::2]
    t, c = x.shape[1], x.shape[2]
    wide = fold == 1 and c >= _TP_MIN_CHANNELS  # see param_specs
    for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], acts1, acts2, dilations):
        pad1 = nn.get_padding(kernel_size, d)
        pad2 = nn.get_padding(kernel_size)
        xt = _aa_snake(a1, x, cfg.snake_logscale, training, fold, lens)
        if fold > 1:
            xt = nn.conv1d_folded_io(c1, xt, padding=pad1, dilation=d, fold=fold)
        else:
            xt = nn.conv1d(c1, xt, padding=pad1, dilation=d, fold=nn.choose_fold(kernel_size, d, pad1, c, t))
        xt = _aa_snake(a2, _len_mask(shard_channels(xt, wide), lens), cfg.snake_logscale, training, fold, lens)
        if fold > 1:
            xt = nn.conv1d_folded_io(c2, xt, padding=pad2, fold=fold)
        else:
            xt = nn.conv1d(c2, xt, padding=pad2, fold=nn.choose_fold(kernel_size, 1, pad2, c, t))
        x = _len_mask(shard_channels(xt, wide), lens) + x
    return x


def init(key, cfg: BigVGANConfig) -> dict:
    n_ups = len(cfg.upsample_rates)
    n_k = len(cfg.resblock_kernel_sizes)
    keys = jax.random.split(key, 3 + 2 * n_ups + n_ups * n_k)
    it = iter(keys)

    params: dict = {
        "conv_pre": nn.conv1d_init(
            next(it), cfg.num_mels, cfg.upsample_initial_channel, cfg.pre_conv_kernel_size, weight_norm=True
        )
    }
    ups, noise_convs, resblocks = [], [], []
    ch = cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_in = cfg.upsample_initial_channel // (2**i)
        c_cur = cfg.upsample_initial_channel // (2 ** (i + 1))
        ups.append(nn.conv_transpose1d_init(next(it), c_in, c_cur, k, weight_norm=True, init="normal"))
        if cfg.use_template:
            if i + 1 < n_ups:
                stride_f0 = prod(cfg.upsample_rates[i + 1 :])
                noise_convs.append(nn.conv1d_init(next(it), 1, c_cur, stride_f0 * 2))
            else:
                noise_convs.append(nn.conv1d_init(next(it), 1, c_cur, 1))
        for k_r, d_r in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(_amp_init(next(it), c_cur, k_r, d_r, cfg))
        ch = c_cur

    params["ups"] = ups
    if cfg.use_template:
        params["noise_convs"] = noise_convs
    params["resblocks"] = resblocks
    params["post_act"] = _snake_init(ch, cfg.activation, True)  # alpha_logscale=True (bigvgan.py:335-337)
    params["conv_post"] = nn.conv1d_init(next(it), ch, 1, cfg.post_conv_kernel_size, weight_norm=True, init="normal")
    return params


def param_specs(cfg: BigVGANConfig):
    """PartitionSpec tree mirroring init(): tensor parallelism for the wide
    stages (VERDICT r2 missing #3; the BASELINE.md north star names
    BigVGAN-base channel sharding).

    Identical scheme to models/hifigan.py::param_specs — channel-sharded
    activations through every C >= _TP_MIN_CHANNELS stage, row-parallel conv
    weights, reduce-scattered outputs — which here additionally divides the
    anti-aliased snake work (the measured ~85% of BigVGAN inference cost,
    BENCH.md ablation) across the model axis: snake alpha/beta are (C,)
    per-channel parameters and shard with the activations.  Note the Pallas
    aa-snake backend is a custom call GSPMD cannot partition; under a model>1
    mesh the XLA poly4/polyphase backends partition cleanly (AA_BACKEND
    "auto" already picks poly4 for training).
    """
    from jax.sharding import PartitionSpec as P

    from vocoder_tpu.parallel import tp_specs as tp

    R = P()
    m = _TP_MIN_CHANNELS

    def snake(c: int) -> dict:
        spec = P("model") if c >= m else R
        return {"alpha": spec, "beta": spec} if cfg.activation == "snakebeta" else {"alpha": spec}

    n_ups = len(cfg.upsample_rates)
    specs: dict = {"conv_pre": tp.col_conv(cfg.upsample_initial_channel, m)}
    ups, noise_convs, resblocks = [], [], []
    for i in range(n_ups):
        c_in = cfg.upsample_initial_channel // (2**i)
        c_out = cfg.upsample_initial_channel // (2 ** (i + 1))
        ups.append(tp.row_up(c_in, c_out, m))
        if cfg.use_template:
            noise_convs.append(tp.noise_conv(c_out, m))
        for d_r in cfg.resblock_dilation_sizes:
            resblocks.append(
                {
                    "convs1": [tp.row_conv(c_out, c_out, m) for _ in d_r],
                    "convs2": [tp.row_conv(c_out, c_out, m) for _ in d_r],
                    "activations": [snake(c_out) for _ in range(2 * len(d_r))],
                }
            )
    specs["ups"] = ups
    if cfg.use_template:
        specs["noise_convs"] = noise_convs
    specs["resblocks"] = resblocks
    # Post stage (C = uic / 2^n_ups) is always narrow in shipped configs.
    specs["post_act"] = (
        {"alpha": R, "beta": R} if cfg.activation == "snakebeta" else {"alpha": R}
    )
    specs["conv_post"] = tp.rep_wn()
    return specs


def apply(
    params: dict,
    mel: jnp.ndarray,
    cfg: BigVGANConfig,
    template: jnp.ndarray | None = None,
    *,
    training: bool = False,
    rng=None,
    frame_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """mel (B, num_mels, T) -> audio (B, 1, T*hop).

    frame_lengths (B,) enables exact variable-length batching (see
    models/hifigan.py); the anti-aliased activations additionally re-splice
    each item's edge-replicated boundary (aa_snake_poly4_masked).
    """
    from vocoder_tpu.parallel import shard_channels

    n_k = len(cfg.resblock_kernel_sizes)
    x = jnp.transpose(mel, (0, 2, 1))
    x = nn.conv1d(params["conv_pre"], x, padding=nn.get_padding(cfg.pre_conv_kernel_size))
    x = shard_channels(x, cfg.upsample_initial_channel >= _TP_MIN_CHANNELS)
    lens = frame_lengths
    x = _len_mask(x, lens)

    if cfg.use_template:
        template_t = jnp.transpose(template, (0, 2, 1))

    amp = _amp_apply
    if cfg.checkpointing:
        amp = jax.checkpoint(_amp_apply, static_argnums=(2, 3, 4, 5, 6))

    b = x.shape[0]
    active = _fold_active() and lens is None
    r = 1  # current time-fold factor of x: x is (B, T/r, r*C)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_out = cfg.upsample_initial_channel // (2 ** (i + 1))
        x, r, t_cur = nn.folded_stack_upsample(
            params["ups"][i], x, fold=r, stride=u, kernel=k, c_out=c_out, active=active
        )
        x = shard_channels(x, r == 1 and c_out >= _TP_MIN_CHANNELS)
        if lens is not None:
            lens = lens * u
            x = _len_mask(x, lens)
        if cfg.use_template:
            nc = params["noise_convs"][i]
            if i + 1 < len(cfg.upsample_rates):
                stride_f0 = prod(cfg.upsample_rates[i + 1 :])
                noise = nn.conv1d(nc, template_t, stride=stride_f0, padding=stride_f0 // 2)
            else:
                noise = nn.conv1d(nc, template_t)
            x = x + (noise.reshape(b, t_cur // r, r * c_out) if r > 1 else noise)
            x = _len_mask(x, lens)
        fused_done = False
        if AMP_BACKEND == "fused" and not training and lens is None:
            from vocoder_tpu.ops.pallas import amp_block

            mode = amp_block.amp_stage_supported(
                x, cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes, r,
                interpret=amp_block.INTERPRET,
            )
            if mode == "stage":
                x = amp_block.amp_stage_fused(
                    [params["resblocks"][i * n_k + j] for j in range(n_k)],
                    x,
                    cfg.resblock_kernel_sizes,
                    cfg.resblock_dilation_sizes,
                    cfg.snake_logscale,
                    r,
                    interpret=amp_block.INTERPRET,
                )
                fused_done = True
            elif mode == "block":
                # Wide (L == 256) stage: one kernel per block (all three
                # blocks' folded conv weights exceed VMEM together), mean
                # taken here — x is re-read per block, but this stage carries
                # 1/8 of the big stages' samples.
                outs = [
                    amp_block.amp_stage_fused(
                        [params["resblocks"][i * n_k + j]],
                        x,
                        (cfg.resblock_kernel_sizes[j],),
                        (cfg.resblock_dilation_sizes[j],),
                        cfg.snake_logscale,
                        r,
                        interpret=amp_block.INTERPRET,
                    )
                    for j in range(n_k)
                ]
                x = sum(outs) / n_k
                fused_done = True
        if not fused_done:
            outs = [
                amp(params["resblocks"][i * n_k + j], x, cfg.resblock_kernel_sizes[j], cfg.resblock_dilation_sizes[j], cfg, training, r, lens)
                for j in range(n_k)
            ]
            x = sum(outs) / n_k

    x = _aa_snake(params["post_act"], x, True, training, r, lens)
    if r > 1:
        x = nn.conv1d_folded_io(params["conv_post"], x, padding=nn.get_padding(cfg.post_conv_kernel_size), fold=r)
        x = x.reshape(b, -1, 1)
    else:
        x = nn.conv1d(params["conv_post"], x, padding=nn.get_padding(cfg.post_conv_kernel_size))
    x = _len_mask(jnp.tanh(x), lens)
    return jnp.transpose(x, (0, 2, 1))


def from_torch_state_dict(sd: dict, cfg: BigVGANConfig, prefix: str = "") -> dict:
    p = prefix
    n_ups = len(cfg.upsample_rates)
    n_k = len(cfg.resblock_kernel_sizes)
    params: dict = {"conv_pre": conv1d_from_torch(sd, f"{p}conv_pre")}
    params["ups"] = [conv_transpose1d_from_torch(sd, f"{p}ups.{i}") for i in range(n_ups)]
    if cfg.use_template:
        params["noise_convs"] = [conv1d_from_torch(sd, f"{p}noise_convs.{i}") for i in range(n_ups)]
    resblocks = []
    for r in range(n_ups * n_k):
        n_d = len(cfg.resblock_dilation_sizes[r % n_k])
        block = {
            "convs1": [conv1d_from_torch(sd, f"{p}resblocks.{r}.convs1.{l}") for l in range(n_d)],
            "convs2": [conv1d_from_torch(sd, f"{p}resblocks.{r}.convs2.{l}") for l in range(n_d)],
            "activations": [],
        }
        for a in range(2 * n_d):
            act = {"alpha": _np(sd[f"{p}resblocks.{r}.activations.{a}.activation.alpha"])}
            bkey = f"{p}resblocks.{r}.activations.{a}.activation.beta"
            if bkey in sd:
                act["beta"] = _np(sd[bkey])
            block["activations"].append(act)
        resblocks.append(block)
    params["resblocks"] = resblocks
    post = {"alpha": _np(sd[f"{p}activation_post.activation.alpha"])}
    if f"{p}activation_post.activation.beta" in sd:
        post["beta"] = _np(sd[f"{p}activation_post.activation.beta"])
    params["post_act"] = post
    params["conv_post"] = conv1d_from_torch(sd, f"{p}conv_post")
    return jax.tree.map(jnp.asarray, params)
