"""Spectral ops: STFT magnitude, log-mel, iSTFT — TPU-native (MXU-friendly).

Instead of delegating to cuFFT like the reference (torch.stft in
fish_vocoder/data/transforms/spectrogram.py:38-49, modules/discriminators/
mrd.py:62-69, modules/losses/stft.py:24-32), the STFT here is framing by
reshape + static slices (frame_signal) feeding one MXU matmul against a
*windowed DFT basis* of ``2*(n_fft//2+1)`` columns — the windowing and DFT
fuse into the matmul, there is no gather, and (crucially for training) the
VJP is a handful of slice-adds plus the transposed matmul, where a strided
conv formulation's input gradient lowers as a dense lhs-dilated conv
(measured ~100x slower in the MR-STFT loss backward on TPU).

Semantics match the reference exactly (verified by parity tests against
torch.stft oracles):

- ``padding="same_win"``   -> reflect-pad ((win-hop)//2, (win-hop+1)//2),
  center=False; used by LinearSpectrogram (spectrogram.py:29-36).
- ``padding="same_nfft"``  -> reflect-pad ((n_fft-hop)//2, (n_fft-hop+1)//2),
  center=False; used by the MRD discriminator (mrd.py:52-60).
- ``padding="center"``     -> reflect-pad n_fft//2 both sides (torch.stft
  center=True default); used by the MR-STFT loss (losses/stft.py:24-32).

Magnitude modes:
- ``"eps_inside"``  : sqrt(re^2 + im^2 + 1e-6)        (spectrogram.py:54)
- ``"clamp_inside"``: sqrt(clamp(re^2 + im^2, 1e-6))  (losses/stft.py:36)
- ``"plain"``       : sqrt(re^2 + im^2)               (mrd.py:71 torch.norm)

The iSTFT implements the vocos "same"-padding semantics (overlap-add of
windowed irfft frames, normalised by the window-square envelope, trimmed by
(win-hop)//2 on both sides) used by ISTFTHead (modules/generators/vocos.py:33-38).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Windows and filterbanks (host-side constants, cached per config)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window, matching torch.hann_window(win_length)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0
    logstep = math.log(6.4) / 27.0
    mel = f * 3.0 / 200.0
    with np.errstate(divide="ignore"):
        log_mel = min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_mel, mel)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0
    logstep = math.log(6.4) / 27.0
    f = m * 200.0 / 3.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Slaney-scale, slaney-normalised mel filterbank, shape (n_freqs, n_mels).

    Matches torchaudio.functional.melscale_fbanks(..., norm="slaney",
    mel_scale="slaney") as used by LogMelSpectrogram (spectrogram.py:83-91).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    m_min = _hz_to_mel_slaney(np.array(f_min))
    m_max = _hz_to_mel_slaney(np.array(f_max))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # Slaney area normalisation
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_conv_basis(n_fft: int, win_length: int, window: str = "hann") -> np.ndarray:
    """Windowed forward-DFT basis as a conv kernel, shape (n_fft, 1, 2*bins).

    Output channels are [cos * win | -sin * win], so a stride-`hop` VALID conv
    yields interleaved (re, im) STFT coefficients.  The window is centre-padded
    to n_fft when win_length < n_fft, matching torch.stft.  ``window="boxcar"``
    reproduces torch.stft called WITHOUT a window argument (rectangular ones),
    which is what the MRD discriminator does (mrd.py:62-69).
    """
    bins = n_fft // 2 + 1
    if window == "hann":
        win = hann_window(win_length).astype(np.float64)
    elif window == "boxcar":
        win = np.ones(win_length, dtype=np.float64)
    else:
        raise ValueError(f"unknown window {window!r}")
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.zeros(n_fft, dtype=np.float64)
        w[left : left + win_length] = win
    else:
        w = win
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, bins)
    basis = np.concatenate([np.cos(ang) * w[:, None], -np.sin(ang) * w[:, None]], axis=1)
    return basis.astype(np.float32)[:, None, :].transpose(0, 1, 2)  # (n_fft, 1, 2*bins)


@functools.lru_cache(maxsize=None)
def _idft_basis(n_fft: int) -> np.ndarray:
    """Inverse real-DFT basis, shape (2*bins, n_fft): frames = [re|im] @ basis."""
    bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft  # (bins, n_fft)
    c = np.full(bins, 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    re_basis = (np.cos(ang) * c[:, None]) / n_fft
    im_basis = (-np.sin(ang) * c[:, None]) / n_fft
    return np.concatenate([re_basis, im_basis], axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def _pad_signal(x: jnp.ndarray, padding: str, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    if padding == "same_win":
        pads = ((win - hop) // 2, (win - hop + 1) // 2)
    elif padding == "same_nfft":
        pads = ((n_fft - hop) // 2, (n_fft - hop + 1) // 2)
    elif padding == "center":
        pads = (n_fft // 2, n_fft // 2)
    elif padding == "none":
        return x
    else:
        raise ValueError(f"unknown padding mode {padding!r}")
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [pads], mode="reflect")


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(B, T) -> (B, F, n_fft) sliding frames, F = (T - n_fft)//hop + 1.

    Built from reshape + r static slices + concat (no gather, no strided
    conv): the VJP is r cheap slice-adds, unlike a stride-`hop`
    kernel-`n_fft` conv whose input-gradient XLA lowers as a dense
    lhs-dilated conv (measured ~100x slower in the MR-STFT loss backward).
    """
    b, t = x.shape
    f = (t - n_fft) // hop_length + 1
    r = -(-n_fft // hop_length)  # ceil
    rows_needed = f + r - 1
    need = rows_needed * hop_length
    if need > t:
        x = jnp.pad(x, ((0, 0), (0, need - t)))
    rows = x[:, : rows_needed * hop_length].reshape(b, rows_needed, hop_length)
    parts = [rows[:, j : j + f, :] for j in range(r)]
    return jnp.concatenate(parts, axis=2)[:, :, :n_fft]


def stft_reim(
    x: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    padding: str = "same_win",
    window: str = "hann",
    precision=lax.Precision.HIGHEST,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real/imag STFT of (B, T) audio -> two (B, bins, frames) arrays."""
    x = _pad_signal(x, padding, n_fft, hop_length, win_length)
    frames = frame_signal(x, n_fft, hop_length)  # (B, F, n_fft)
    basis = jnp.asarray(_dft_conv_basis(n_fft, win_length, window))[:, 0, :].astype(x.dtype)
    out = jnp.einsum("bfn,nk->bfk", frames, basis, precision=precision)
    bins = n_fft // 2 + 1
    re = jnp.transpose(out[..., :bins], (0, 2, 1))
    im = jnp.transpose(out[..., bins:], (0, 2, 1))
    return re, im


def stft_magnitude(
    x: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    padding: str = "same_win",
    mag_mode: str = "eps_inside",
    window: str = "hann",
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Magnitude STFT of (B, T) audio -> (B, bins, frames)."""
    re, im = stft_reim(
        x,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        padding=padding,
        window=window,
        precision=precision,
    )
    power = re * re + im * im
    if mag_mode == "eps_inside":
        return jnp.sqrt(power + 1e-6)
    if mag_mode == "clamp_inside":
        return jnp.sqrt(jnp.maximum(power, 1e-6))
    if mag_mode == "plain":
        # torch.norm's subgradient at 0 is 0; naive jnp.sqrt(0) backpropagates
        # inf and one zero-power bin NaNs the whole generator gradient.
        safe = jnp.where(power > 0, power, 1.0)
        return jnp.where(power > 0, jnp.sqrt(safe), 0.0)
    raise ValueError(f"unknown mag_mode {mag_mode!r}")


def log_mel_spectrogram(
    x: jnp.ndarray,
    *,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Log-mel features of (B, T) audio -> (B, n_mels, frames).

    Pipeline parity: LinearSpectrogram (pow2_sqrt, +1e-6) -> slaney MelScale ->
    log(clamp(x, 1e-5))  (spectrogram.py:93-104).
    """
    mag = stft_magnitude(
        x,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        padding="same_win",
        mag_mode="eps_inside",
        precision=precision,
    )  # (B, bins, frames)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max)).astype(mag.dtype)
    mel = jnp.einsum("bft,fm->bmt", mag, fb, precision=precision)
    return jnp.log(jnp.maximum(mel, 1e-5))


def linear_spectrogram(
    x: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """LinearSpectrogram parity: (B, T) -> (B, bins, frames)."""
    return stft_magnitude(
        x,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        padding="same_win",
        mag_mode="eps_inside",
        precision=precision,
    )


# ---------------------------------------------------------------------------
# Overlap-add and iSTFT
# ---------------------------------------------------------------------------


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add (B, F, N) frames with the given hop -> (B, (F-1)*hop + N).

    Frames are zero-padded to a multiple of hop and reshaped into
    ceil(N/hop) shifted lanes that sum with plain adds — no gather/scatter,
    no conv, cheap forward AND backward for any (N, hop) pair (e.g.
    n_fft=3072, hop=2048 in resolution 24000_2048_3072).
    """
    b, f, n = frames.shape
    out_len = (f - 1) * hop_length + n
    r = -(-n // hop_length)  # ceil
    n_pad = r * hop_length
    if n_pad > n:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_pad - n)))
    parts = frames.reshape(b, f, r, hop_length)
    padded_len = (f - 1) * hop_length + n_pad
    total = jnp.zeros((b, padded_len), dtype=frames.dtype)
    for j in range(r):
        part = parts[:, :, j, :].reshape(b, f * hop_length)
        part = jnp.pad(part, ((0, 0), (j * hop_length, (r - 1 - j) * hop_length)))
        total = total + part
    return total[:, :out_len]


def istft_same(
    re: jnp.ndarray,
    im: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    precision=lax.Precision.HIGHEST,
    frame_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Vocos-style "same"-padding iSTFT.

    Args:
        re, im: (B, bins, frames) real/imag STFT coefficients.
        frame_lengths: optional (B,) true frame counts for variable-length
            batches: padded frames are zeroed and the window-square envelope
            is accumulated per item over its true frames only, so row i
            equals the unbatched iSTFT of its first frame_lengths[i] frames
            (callers trim to frame_lengths[i] * hop samples).
    Returns:
        (B, frames * hop) waveform (when win-hop is even, as in all configs).

    Matches vocos.spectral_ops.ISTFT(padding="same") consumed at
    modules/generators/vocos.py:33-38: irfft per frame, multiply by the Hann
    window, overlap-add, divide by the window-square envelope, trim
    (win-hop)//2 from both ends.
    """
    if win_length != n_fft:
        raise NotImplementedError("istft_same requires win_length == n_fft")
    b, bins, f = re.shape
    coeffs = jnp.concatenate([re, im], axis=1)  # (B, 2*bins, F)
    basis = jnp.asarray(_idft_basis(n_fft)).astype(coeffs.dtype)  # (2*bins, n_fft)
    frames = jnp.einsum("bkf,kn->bfn", coeffs, basis, precision=precision)
    win = jnp.asarray(hann_window(win_length)).astype(frames.dtype)
    frames = frames * win[None, None, :]

    win_sq = jnp.broadcast_to((win * win)[None, None, :], (1, f, n_fft))
    if frame_lengths is not None:
        fmask = (jnp.arange(f)[None, :] < frame_lengths[:, None]).astype(frames.dtype)
        frames = frames * fmask[..., None]
        win_sq = win_sq * fmask[..., None]
    y = overlap_add(frames, hop_length)
    envelope = overlap_add(win_sq, hop_length)
    y = y / jnp.maximum(envelope, 1e-11)

    pad = (win_length - hop_length) // 2
    out_len = (f - 1) * hop_length + win_length - 2 * pad
    return y[:, pad : pad + out_len]
