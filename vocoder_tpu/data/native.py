"""ctypes bindings for the native C++ audio kernels (native/audio_kernels.cc).

Auto-builds the shared library on first use (make -C native) and transparently
falls back to the pure-numpy implementations when no compiler is available.
The Python and C++ paths share the same filter design and are parity-tested
against each other.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libaudio_kernels.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # make is mtime-aware: a no-op when the .so is current, a rebuild when
        # audio_kernels.cc gained symbols since the .so was produced.  The
        # flock serialises concurrent first-use across worker processes so no
        # one dlopens a half-written .so.
        try:
            import fcntl

            with open(_NATIVE_DIR / ".build.lock", "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
        except Exception:
            if not _LIB_PATH.exists():
                raise
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.decode_pcm16.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib.decode_pcm24.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib.decode_pcm32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib.resample_poly.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.peak_abs.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.peak_abs.restype = ctypes.c_float
        lib.scale_inplace.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_float]
        lib.flac_probe.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.flac_probe.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.flac_decode.restype = ctypes.c_int64
        lib.ogg_probe.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.ogg_probe.restype = ctypes.c_int
        lib.ogg_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_int64,
        ]
        lib.ogg_decode_file.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_pcm(data: bytes, bits: int, channels: int) -> np.ndarray | None:
    """Interleaved PCM bytes -> float32 (channels, frames); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    bytes_per = bits // 8
    frames = len(data) // (bytes_per * channels)
    buf = np.frombuffer(data, dtype=np.uint8)[: frames * channels * bytes_per].copy()
    out = np.empty((channels, frames), np.float32)
    fn = {16: lib.decode_pcm16, 24: lib.decode_pcm24, 32: lib.decode_pcm32}.get(bits)
    if fn is None:
        return None
    fn(buf.ctypes.data, out.ctypes.data, frames, channels)
    return out


def flac_decode(data: bytes) -> tuple[np.ndarray, int] | None:
    """FLAC bytes -> (float32 (channels, T), sample_rate) via the C++ decoder.

    Returns None when the library is unavailable or the stream needs the
    pure-Python decoder (unknown total length); raises ValueError on corrupt
    streams, mirroring vocoder_tpu.data.flac.read_flac semantics.
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    info = np.zeros(5, np.int64)
    if lib.flac_probe(buf.ctypes.data, len(buf), info.ctypes.data) != 0:
        raise ValueError("not a FLAC stream")
    sr, channels, bps, total, start_bits = (int(v) for v in info)
    if total == 0:
        return None  # unknown length: pure-Python path handles it
    # Sanity-bound the untrusted 36-bit STREAMINFO total BEFORE allocating:
    # even all-constant silence compresses no better than a few bytes per
    # 4096-sample block, so cap the claimed expansion and the absolute size
    # rather than attempting a multi-TB np.empty on a corrupt header.
    out_bytes = total * channels * 4
    if out_bytes > max(16384 * len(data), 1 << 20) or out_bytes > (8 << 30):
        raise ValueError(
            f"implausible FLAC STREAMINFO: {total} samples x {channels} ch "
            f"declared by a {len(data)}-byte stream"
        )
    out = np.empty((channels, total), np.float32)
    got = lib.flac_decode(buf.ctypes.data, len(buf), start_bits, channels, bps, total, out.ctypes.data)
    if got < 0:
        raise ValueError(f"corrupt FLAC stream (native decoder error {got})")
    if got < total:
        raise ValueError(f"truncated stream — {got} of {total} declared samples")
    return out, sr


def ogg_decode(path) -> tuple[np.ndarray, int] | None:
    """Ogg/Vorbis file -> (float32 (channels, T), sample_rate) via the C++
    decode loop (one GIL-released foreign call for the whole file — the
    Python chunk loop serialised thread-pool workers, BENCH.md r4).

    Returns None whenever the fast path cannot handle the file — library or
    libvorbisfile unavailable, undecodable, unknown/implausible length,
    chained, holey — so the ctypes pull loop re-decodes and raises ITS
    canonical errors: the native path is a pure optimisation with no error-
    semantics drift.
    """
    lib = _load()
    if lib is None:
        return None
    p = str(path).encode()
    info = np.zeros(3, np.int64)
    if lib.ogg_probe(p, info.ctypes.data) != 0:
        return None
    channels, rate, total = (int(v) for v in info)
    if total * channels * 4 > (8 << 30):
        return None
    out = np.empty((channels, total), np.float32)
    got = lib.ogg_decode_file(p, out.ctypes.data, channels, total)
    if got <= 0:
        # Any anomaly (hole, chained link, over-long stream, no frames): the
        # pull loop re-decodes and raises its canonical errors.
        return None
    return out[:, :got], rate


def resample_native(x: np.ndarray, orig_freq: int, new_freq: int, kernels: np.ndarray, width: int) -> np.ndarray | None:
    """1-D resample via the C++ polyphase kernel; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    import math

    x = np.ascontiguousarray(x, np.float32)
    kernels = np.ascontiguousarray(kernels, np.float32)
    y_len = math.ceil(new_freq * x.shape[-1] / orig_freq)
    y = np.empty(y_len, np.float32)
    lib.resample_poly(
        x.ctypes.data, x.shape[-1], kernels.ctypes.data, new_freq, orig_freq, kernels.shape[1], width, y.ctypes.data, y_len
    )
    return y


def peak_normalize_inplace(x: np.ndarray, threshold: float = 1.0, target: float = 0.99) -> np.ndarray:
    """Peak-normalise when |x| >= threshold (datasets/vocoder.py:39-40)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        peak = float(np.max(np.abs(x))) if x.size else 0.0
        if peak >= threshold:
            x = x / (peak / target)
        return x
    peak = lib.peak_abs(x.ctypes.data, x.size)
    if peak >= threshold:
        lib.scale_inplace(x.ctypes.data, x.size, target / peak)
    return x
