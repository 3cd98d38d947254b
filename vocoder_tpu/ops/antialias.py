"""Anti-aliased (alias-free) up/down sampling for periodic activations.

TPU-native equivalent of the `alias_free_torch` package used by the
reference's BigVGAN (modules/generators/bigvgan.py:9,226-233,335-337):
Kaiser-windowed sinc low-pass FIRs around each Snake activation —
2x polyphase upsample -> activation -> 2x decimating low-pass.

All filters are depthwise convs in channels-last layout; XLA fuses the
upsample/act/downsample stack per resblock layer.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """LPF design matching alias_free_torch.filter.kaiser_sinc_filter1d."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f = f / f.sum()
    return f.astype(np.float32)


def _depthwise_kernel(filt: np.ndarray, channels: int, dtype) -> jnp.ndarray:
    # (K,) -> (K, 1, C) HIO depthwise kernel (filter shared across channels).
    return jnp.broadcast_to(jnp.asarray(filt, dtype)[:, None, None], (filt.shape[0], 1, channels))


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T*ratio, C); alias_free_torch.resample.UpSample1d."""
    b, t, c = x.shape
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    w = _depthwise_kernel(filt[::-1].copy(), c, x.dtype)  # flip for transposed conv

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = ratio * lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T//ratio, C); alias_free_torch.resample.DownSample1d."""
    b, t, c = x.shape
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    w = _depthwise_kernel(filt, c, x.dtype)

    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(ratio,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def aa_snake_polyphase(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool
) -> jnp.ndarray:
    """Fused anti-aliased snake at 1x rate, pure XLA.

    Drop-in for downsample1d(snake(upsample1d(x, 2)), 2) on (B, T, C): the
    polyphase decomposition (see ops/pallas/aa_snake.py for the derivation)
    turns the up(2x) -> snake -> down(2x) pipeline into two 6-tap depthwise
    correlations at 1x rate, the snake nonlinearity on each branch, and two
    more 6-tap correlations — the 2x-rate intermediate never exists.  Halves
    the FLOPs/bandwidth of the activation stack; measured ~2x on BigVGAN.
    The outer 3 samples (where the unfused pipeline's edge replication of the
    intermediate differs) are recomputed with the reference composition and
    spliced, so the result is numerically equivalent end to end.
    """

    def _snake(v, a, bgain):
        return v + (1.0 / (bgain + 1e-9)) * jnp.square(jnp.sin(v * a))

    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    a2 = alpha[None, :].astype(jnp.float32)
    b2 = beta[None, :].astype(jnp.float32)

    b, t, c = x.shape
    f = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)
    f_e = np.asarray([f[11 - 2 * j] for j in range(6)])  # even-branch taps
    f_o = np.asarray([f[10 - 2 * j] for j in range(6)])  # odd-branch taps
    g_o = np.asarray([f[2 * a_ + 1] for a_ in range(6)])
    g_e = np.asarray([f[2 * a_] for a_ in range(6)])

    # Fused-branch form ("v1"): both polyphase branches ride ONE depthwise
    # conv with channel multiplier 2 (group g -> out channels [2g, 2g+1]),
    # one snake over 2C interleaved channels, and ONE multiplier-2->1
    # depthwise conv that applies g_o/g_e per branch and pair-sums inside the
    # group contraction.  Halves conv-op count vs four separate depthwise
    # convs; measured 577 -> 520 ms on BigVGAN b16 (v5e).
    # x window [t0-5, t0+T+5]: se needs x[u-5..], so needs x[u-5..] with the
    # same base (see the pallas kernel's indexing; base offset 0 here since we
    # pad exactly 5/6).
    xp = jnp.pad(x, ((0, 0), (5, 6), (0, 0)), mode="edge")
    # se_local[u] = snake(2*sum_j xp[u+j]*f_e[j]),   u in [0, T+6)
    # so_local[v] = snake(2*sum_j xp[v+j]*f_o[j]),   v in [0, T+6)
    w_in = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(f_e, x.dtype)[:, None], (6, c)),
            jnp.broadcast_to(jnp.asarray(f_o, x.dtype)[:, None], (6, c)),
        ],
        axis=2,
    ).reshape(6, 1, 2 * c)  # interleaved [f_e, f_o] per source channel
    y = lax.conv_general_dilated(
        xp, w_in, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )  # (B, T+6, 2C) interleaved [se, so] per source channel
    a2c = jnp.repeat(alpha, 2)[None, :].astype(jnp.float32)
    b2c = jnp.repeat(beta, 2)[None, :].astype(jnp.float32)
    y = _snake(2.0 * y.astype(jnp.float32), a2c, b2c).astype(x.dtype)
    # z[t] = sum_a g_o[a]*se[t+a] + g_e[a]*so[t+a]: depthwise over the 2C
    # interleaved channels + explicit pair-sum.  NOT a grouped 2->1
    # contraction (feature_group_count=c with I/G=2): XLA lowers tiny
    # per-group contractions terribly (1084 vs 520 ms measured, same math —
    # see BENCH.md "interleaved grouped-conv polyphase" negative result).
    w_out = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(g_o, x.dtype)[:, None], (6, c)),
            jnp.broadcast_to(jnp.asarray(g_e, x.dtype)[:, None], (6, c)),
        ],
        axis=2,
    ).reshape(6, 1, 2 * c)  # interleaved [g_o, g_e] per source channel
    z2 = lax.conv_general_dilated(
        y[:, : t + 5, :], w_out, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=2 * c,
        precision=lax.Precision.HIGHEST,
    )  # (B, T, 2C)
    z = z2.reshape(b, t, c, 2).sum(-1)

    # Exact edges (y-replication differs): recompute outer 4 with the
    # reference composition on short windows and splice.
    def unfused(v):
        return downsample1d(_snake(upsample1d(v, 2).astype(jnp.float32), a2, b2).astype(v.dtype), 2)

    e, w = 4, 32
    if t >= 2 * w:
        left = unfused(x[:, :w, :])[:, :e, :]
        right = unfused(x[:, -w:, :])[:, -e:, :]
        z = z.at[:, :e, :].set(left)
        z = z.at[:, t - e :, :].set(right)
    else:
        z = unfused(x)
    return z
