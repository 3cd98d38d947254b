"""Objective audio metrics (host/JAX, no native deps).

The reference's offline eval is PESQ-NB/WB + mel-L1 (eval.py:15-33).  PESQ
runs through the native P.862 implementation (vocoder_tpu/pesq_native.py) —
the ITU C extension is preferred automatically when importable.  Alongside
it, two exactly-specified metrics:

- SI-SDR (scale-invariant signal-to-distortion ratio, Le Roux et al. 2019)
- MCD (mel-cepstral distortion over DCT-II of the log-mel, dB)
"""

from __future__ import annotations

import functools

import numpy as np


_warned_native_pesq = False


def pesq(reference: np.ndarray, estimate: np.ndarray, sample_rate: int, mode: str = "wb") -> float:
    """PESQ MOS-LQO (P.862.1 nb / P.862.2 wb); prefers the ITU C extension,
    falls back to the in-repo native implementation.  Inputs must already be
    at 8 kHz (nb) / 16 kHz (wb), like the C wrapper."""
    global _warned_native_pesq
    try:
        from pesq import pesq as _itu_pesq  # C ext, if the env ever has it

        return float(_itu_pesq(sample_rate, np.asarray(reference), np.asarray(estimate), mode))
    except ImportError:
        from vocoder_tpu.pesq_native import pesq as _native_pesq

        if not _warned_native_pesq:
            _warned_native_pesq = True
            import sys

            print(
                "note: PESQ computed by the in-repo P.862 implementation "
                "(vocoder_tpu/pesq_native.py) — the ITU C extension is not "
                "installed. Scores are on the MOS-LQO scale and pinned by "
                "golden fixtures, but are not bit-comparable to ITU-extension "
                "numbers.",
                file=sys.stderr,
            )
        return float(_native_pesq(reference, estimate, sample_rate, mode))


def si_sdr(reference: np.ndarray, estimate: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SDR in dB; inputs (T,) aligned."""
    s = np.asarray(reference, np.float64)
    x = np.asarray(estimate, np.float64)
    s = s - s.mean()
    x = x - x.mean()
    alpha = np.dot(x, s) / (np.dot(s, s) + eps)
    target = alpha * s
    noise = x - target
    return float(10.0 * np.log10((np.sum(target**2) + eps) / (np.sum(noise**2) + eps)))


@functools.lru_cache(maxsize=None)
def _dct_matrix(n_mels: int, n_mfcc: int) -> np.ndarray:
    # Orthonormal DCT-II (type 2, norm='ortho'), rows = coefficients.
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    m = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels))
    m[0] *= 1.0 / np.sqrt(2)
    return (m * np.sqrt(2.0 / n_mels)).astype(np.float64)


def mcd(reference: np.ndarray, estimate: np.ndarray, sample_rate: int, n_mfcc: int = 13) -> float:
    """Mel-cepstral distortion (dB) over log-mel DCT coefficients 1..n_mfcc.

    Uses the framework's own slaney log-mel front end (1024 fft / 256 hop /
    128 mel, the eval.py:55 analyzer), excludes c0 (energy), averages the
    per-frame Euclidean distance with the 10*sqrt(2)/ln(10) constant.
    """
    import jax.numpy as jnp

    from vocoder_tpu.ops import log_mel_spectrogram

    kw = dict(sample_rate=sample_rate, n_fft=1024, win_length=1024, hop_length=256, n_mels=128)
    a = np.asarray(log_mel_spectrogram(jnp.asarray(reference[None], jnp.float32), **kw))[0]
    b = np.asarray(log_mel_spectrogram(jnp.asarray(estimate[None], jnp.float32), **kw))[0]
    d = _dct_matrix(128, n_mfcc + 1)
    ca = (d @ a)[1:]  # (n_mfcc, frames), drop c0
    cb = (d @ b)[1:]
    const = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return float(const * np.mean(np.sqrt(np.sum((ca - cb) ** 2, axis=0))))
