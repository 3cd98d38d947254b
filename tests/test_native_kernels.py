"""C++ native kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from vocoder_tpu.data import native
from vocoder_tpu.data.resample import _kernel, resample

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_decode_pcm16_matches_numpy():
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    got = native.decode_pcm(pcm.tobytes(), 16, 2)
    want = pcm.astype(np.float32).T / 32768.0
    np.testing.assert_allclose(got, want)


def test_decode_pcm24_matches_python():
    rng = np.random.default_rng(1)
    vals = rng.integers(-(2**23), 2**23 - 1, size=60, dtype=np.int32)
    raw = bytearray()
    for v in vals:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    got = native.decode_pcm(bytes(raw), 24, 1)
    want = (vals.astype(np.float32) / 8388608.0)[None, :]
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_native_resample_matches_numpy():
    import math

    rng = np.random.default_rng(2)
    x = rng.standard_normal(4410).astype(np.float32)
    orig_sr, new_sr = 44100, 16000
    g = math.gcd(orig_sr, new_sr)
    kernels, width = _kernel(orig_sr // g, new_sr // g)
    got = native.resample_native(x, orig_sr // g, new_sr // g, kernels, width)
    want = resample(x, orig_sr, new_sr)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_peak_normalize():
    x = np.asarray([0.5, -2.0, 1.0], np.float32)
    y = native.peak_normalize_inplace(x.copy())
    np.testing.assert_allclose(np.abs(y).max(), 0.99, rtol=1e-5)
    z = np.asarray([0.1, -0.5], np.float32)
    np.testing.assert_array_equal(native.peak_normalize_inplace(z.copy()), z)


def _python_read_flac(path):
    """Force the pure-Python decoder (the behaviour oracle)."""
    from vocoder_tpu.data import flac as flac_mod

    old = native.flac_decode
    native.flac_decode = lambda data: None
    try:
        return flac_mod.read_flac(path)
    finally:
        native.flac_decode = old


def test_native_flac_decode_bit_exact(tmp_path):
    """C++ flac_decode == pure-Python decoder, bit for bit, across subframe
    types (LPC tonal, verbatim-ish noise, constant) and channel layouts."""
    from vocoder_tpu.data.flac import write_flac

    rng = np.random.default_rng(0)
    sr = 24000
    t = np.arange(sr)
    fixtures = {
        "tonal-mono": (0.4 * np.sin(2 * np.pi * 220 * t / sr)).astype(np.float32),
        "noise-mono": (0.3 * rng.standard_normal(sr)).astype(np.float32),
        "silence": np.zeros(sr // 2, np.float32),
    }
    tone = fixtures["tonal-mono"]
    fixtures["stereo"] = np.stack([tone, 0.7 * tone[::-1]])
    for name, x in fixtures.items():
        p = tmp_path / f"{name}.flac"
        write_flac(p, x, sr)
        got = native.flac_decode(p.read_bytes())
        assert got is not None
        y_n, sr_n = got
        y_p, sr_p = _python_read_flac(p)
        assert sr_n == sr_p == sr
        assert y_n.shape == y_p.shape
        np.testing.assert_array_equal(y_n, y_p)


def test_native_flac_rejects_corrupt_header(tmp_path):
    from vocoder_tpu.data.flac import write_flac

    p = tmp_path / "x.flac"
    write_flac(p, np.sin(np.arange(24000) / 30).astype(np.float32) * 0.4, 24000)
    data = bytearray(p.read_bytes())
    i = bytes(data).find(b"\xff\xf8", 100)  # second frame header
    data[i + 3] ^= 0x10
    with pytest.raises(ValueError):
        native.flac_decode(bytes(data))
