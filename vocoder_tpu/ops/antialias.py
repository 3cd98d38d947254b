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
    polyphase decomposition (derivation in ops/pallas/aa_snake.py) collapses
    up(2x) -> snake -> down(2x) into TWO grouped 6-tap convs at 1x rate with
    the snake in between — the even/odd branches ride interleaved channels
    (group g -> lanes 2g, 2g+1), and the 2x-rate intermediate never exists.
    Zero conv padding is used (no edge-replicate pad copy per activation);
    the outer 8 samples, where zero-padding and the pipeline's intermediate
    edge replication differ, are recomputed with the reference composition on
    short windows and spliced — numerically equivalent end to end (tested).
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
    f_e = np.asarray([f[11 - 2 * j] for j in range(6)])  # even-branch analysis taps
    f_o = np.asarray([f[10 - 2 * j] for j in range(6)])  # odd-branch analysis taps
    g_o = np.asarray([f[2 * a_ + 1] for a_ in range(6)])  # synthesis taps (even lanes)
    g_e = np.asarray([f[2 * a_] for a_ in range(6)])  # synthesis taps (odd lanes)

    def unfused(v):
        return downsample1d(_snake(upsample1d(v, 2).astype(jnp.float32), a2, b2).astype(v.dtype), 2)

    e, w = 8, 32
    if t < 2 * w:
        return unfused(x)

    # conv1: C -> 2C (group g emits the even branch on lane 2g, odd on 2g+1),
    # conv padding (5, 6) == the x window [t0-5, t0+T+5] with zeros at edges.
    w1 = np.zeros((6, 1, 2 * c))
    w1[:, 0, 0::2] = 2.0 * f_e[:, None]
    w1[:, 0, 1::2] = 2.0 * f_o[:, None]
    y = lax.conv_general_dilated(
        x, jnp.asarray(w1, x.dtype), window_strides=(1,), padding=[(5, 6)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )  # (B, T+6, 2C)

    a_i = jnp.repeat(a2, 2, axis=1)
    b_i = jnp.repeat(b2, 2, axis=1)
    y = _snake(y.astype(jnp.float32), a_i, b_i).astype(x.dtype)

    # conv2: 2C -> C (group g combines its two lanes with the synthesis taps).
    w2 = np.zeros((6, 2, c))
    w2[:, 0, :] = g_o[:, None]
    w2[:, 1, :] = g_e[:, None]
    z = lax.conv_general_dilated(
        y, jnp.asarray(w2, x.dtype), window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )[:, :t, :]  # (B, T, C)

    left = unfused(x[:, :w, :])[:, :e, :]
    right = unfused(x[:, -w:, :])[:, -e:, :]
    z = z.at[:, :e, :].set(left)
    z = z.at[:, t - e :, :].set(right)
    return z
