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
