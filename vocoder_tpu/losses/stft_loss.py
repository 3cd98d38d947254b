"""Multi-resolution STFT loss, TPU-native.

Capability parity with /root/reference/fish_vocoder/modules/losses/
stft.py:13-140 (kan-bayashi formulation): per resolution, a center=True
reflect-padded magnitude STFT with sqrt(clamp(power, 1e-6)); spectral
convergence = ||y - x||_F / ||y||_F and log-magnitude L1; both averaged over
resolutions.  All resolutions are computed in ONE jit program; XLA fuses the
conv-DFT STFTs back to back.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from vocoder_tpu.ops import stft_magnitude


def stft_loss_single(
    x: jnp.ndarray, y: jnp.ndarray, res: tuple, precision=lax.Precision.HIGHEST
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x, y: (B, T) predicted/ground-truth -> (sc_loss, mag_loss) scalars."""
    n_fft, hop, win = res
    x_mag = stft_magnitude(
        x, n_fft=n_fft, hop_length=hop, win_length=win, padding="center", mag_mode="clamp_inside",
        precision=precision,
    )
    y_mag = stft_magnitude(
        y, n_fft=n_fft, hop_length=hop, win_length=win, padding="center", mag_mode="clamp_inside",
        precision=precision,
    )
    # Magnitudes may arrive in bf16 (task.loss_stft_dtype relaxes the framing
    # and DFT matmuls); the cheap norm/log reductions always accumulate fp32.
    x_mag = x_mag.astype(jnp.float32)
    y_mag = y_mag.astype(jnp.float32)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


def multi_resolution_stft_loss(
    x: jnp.ndarray, y: jnp.ndarray, resolutions: tuple, precision=lax.Precision.HIGHEST
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Averaged (sc_loss, mag_loss) over resolutions (stft.py:121-140)."""
    sc_total = 0.0
    mag_total = 0.0
    for res in resolutions:
        sc, mag = stft_loss_single(x, y, res, precision)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(resolutions)
    return sc_total / n, mag_total / n
