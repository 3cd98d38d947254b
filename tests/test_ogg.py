"""Ogg/Vorbis data-path tests (companion to test_mp3.py).

The reference's corpus globs include .ogg (fish_vocoder/utils/file.py audio
extension set) and torchaudio decodes it; here decode goes through the
libvorbisfile binding (vocoder_tpu/data/ogg.py), with libvorbisenc producing
the validation fixtures.  Skips cleanly when the system libraries are absent.
"""

import numpy as np
import pytest

from vocoder_tpu.data import transforms as T
from vocoder_tpu.data.dataset import VocoderDataset
from vocoder_tpu.data.ogg import decoder_available, encoder_available, read_ogg, write_ogg

needs_codec = pytest.mark.skipif(
    not (decoder_available() and encoder_available()),
    reason="system libvorbis/libvorbisenc/libogg not present",
)


def _tone(sr: int, seconds: float, freqs=(440.0, 1321.0), amps=(0.5, 0.2)) -> np.ndarray:
    t = np.arange(int(sr * seconds))
    x = sum(a * np.sin(2 * np.pi * f * t / sr) for f, a in zip(freqs, amps))
    return x.astype(np.float32)


@needs_codec
def test_ogg_roundtrip_length_exact_and_faithful(tmp_path):
    sr = 44100
    x = _tone(sr, 2.0)
    write_ogg(tmp_path / "t.ogg", x, sr)
    y, ysr = read_ogg(tmp_path / "t.ogg")
    assert ysr == sr and y.shape == (1, x.size)
    snr = 10 * np.log10(np.mean(x**2) / np.mean((y[0] - x) ** 2))
    assert snr > 25.0, f"ogg roundtrip SNR {snr:.1f} dB"


@needs_codec
def test_ogg_stereo_and_rates(tmp_path):
    for sr in (16000, 24000, 48000):
        x = np.stack([_tone(sr, 0.5), _tone(sr, 0.5, freqs=(554.0,), amps=(0.4,))])
        write_ogg(tmp_path / f"s{sr}.ogg", x, sr)
        y, ysr = read_ogg(tmp_path / f"s{sr}.ogg")
        assert ysr == sr and y.shape == x.shape
        for c in range(2):
            snr = 10 * np.log10(np.mean(x[c] ** 2) / np.mean((y[c] - x[c]) ** 2))
            assert snr > 18.0, (sr, c, snr)


@needs_codec
def test_ogg_via_read_audio_dispatcher_and_dataset(tmp_path):
    from vocoder_tpu.data.audio_io import DECODABLE_EXTENSIONS, read_audio

    assert ".ogg" in DECODABLE_EXTENSIONS
    sr = 24000
    for i in range(2):
        write_ogg(tmp_path / f"d{i}.ogg", _tone(sr, 1.0, freqs=(200.0 + 50 * i,), amps=(0.4,)), sr)
    y, ysr = read_audio(tmp_path / "d0.ogg")
    assert ysr == sr and y.dtype == np.float32 and y.ndim == 2
    tr = T.train_transform(sampling_rate=sr, hop_length=256, num_frames=8)
    ds = VocoderDataset(root=tmp_path, transform=tr)  # must not fail fast
    assert len(ds) == 2
    audio = ds.get(np.random.default_rng(0), 0)
    assert np.abs(audio).max() > 0.01


@needs_codec
def test_corrupt_ogg_is_counted_fallback(tmp_path):
    (tmp_path / "broken.ogg").write_bytes(b"OggS" + bytes(range(256)))
    la = T.LoadAudio(sampling_rate=8000)
    audio = la(np.random.default_rng(0), str(tmp_path / "broken.ogg"))
    assert audio.shape == (1, 8000 * 10)
    assert np.all(audio == 0)
    assert la.fallback_count == 1


@needs_codec
def test_chained_ogg_with_format_change_errors_not_crashes(tmp_path):
    """ov_read_float decodes across chained links transparently; a later link
    with FEWER channels would make pcm[ch] dereference an invalid pointer (a
    process crash the counted fallback can't catch).  read_ogg must raise
    ValueError instead."""
    sr = 16000
    stereo = np.stack([_tone(sr, 0.5), _tone(sr, 0.5, freqs=(250.0,), amps=(0.4,))])
    write_ogg(tmp_path / "a.ogg", stereo, sr)
    write_ogg(tmp_path / "b.ogg", _tone(sr, 0.5), sr)  # mono link
    chained = (tmp_path / "a.ogg").read_bytes() + (tmp_path / "b.ogg").read_bytes()
    (tmp_path / "chained.ogg").write_bytes(chained)
    with pytest.raises(ValueError, match="chained"):
        read_ogg(tmp_path / "chained.ogg")


def test_native_ogg_decode_matches_pull_loop(tmp_path):
    """r4: the C++ whole-file decode (native/audio_kernels.cc ogg_decode_file)
    must produce exactly the ctypes pull loop's samples."""
    from vocoder_tpu.data import native

    if not native.available():
        pytest.skip("native kernels unavailable")
    sr = 16000
    stereo = np.stack([_tone(sr, 0.7), _tone(sr, 0.7, freqs=(250.0,), amps=(0.4,))])
    write_ogg(tmp_path / "x.ogg", stereo, sr)
    got = native.ogg_decode(tmp_path / "x.ogg")
    assert got is not None, "fast path should handle a plain single-link file"
    audio_n, sr_n = got
    # force the pull loop by bypassing the native branch
    import vocoder_tpu.data.ogg as oggmod

    orig = native.ogg_decode
    native.ogg_decode = lambda p: None
    try:
        audio_p, sr_p = oggmod.read_ogg(tmp_path / "x.ogg")
    finally:
        native.ogg_decode = orig
    assert sr_n == sr_p
    np.testing.assert_array_equal(audio_n, audio_p)
