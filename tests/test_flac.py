"""FLAC codec + data-path format-safety tests.

Round-trip coverage of every decoder path (constant/verbatim/fixed/LPC
subframes, Rice + escaped-raw residuals, all four stereo modes, 16/24-bit,
odd block sizes), plus the fail-fast behaviours from round-1 weak #1: an
unsupported corpus rejects at dataset construction, corrupt files are a
LOGGED, counted fallback, and a FLAC corpus trains end to end.
"""

import numpy as np
import pytest

from vocoder_tpu.data import transforms as T
from vocoder_tpu.data.audio_io import UnsupportedFormatError, read_audio, write_wav
from vocoder_tpu.data.dataset import MixDataset, VocoderDataset, batch_iterator
from vocoder_tpu.data.flac import read_flac, write_flac


def _roundtrip(pcm: np.ndarray, sr: int, tmp_path, bits=16, bs=4096):
    path = tmp_path / "t.flac"
    write_flac(path, pcm, sr, bits_per_sample=bits, block_size=bs)
    dec, dsr = read_flac(path)
    assert dsr == sr
    got = np.rint(dec * (1 << (bits - 1))).astype(np.int64)
    np.testing.assert_array_equal(got, pcm)
    return path.stat().st_size / (pcm.size * ((bits + 7) // 8))


def test_flac_tonal_stereo_lossless_and_compressed(tmp_path):
    rng = np.random.default_rng(0)
    t = np.arange(50_000)
    tone = np.rint(np.sin(2 * np.pi * 220 * t / 44100) * 12000).astype(np.int64)
    stereo = np.stack([tone + rng.integers(-30, 30, t.size), tone + rng.integers(-30, 30, t.size)])
    ratio = _roundtrip(stereo, 44100, tmp_path)
    assert ratio < 0.6, f"tonal stereo should compress, got {ratio:.3f}"


def test_flac_white_noise_verbatim_path(tmp_path):
    rng = np.random.default_rng(1)
    noise = rng.integers(-32768, 32768, size=(2, 20_000))
    ratio = _roundtrip(noise, 48000, tmp_path)
    assert ratio < 1.05  # essentially raw + headers


def test_flac_constant_and_silence(tmp_path):
    assert _roundtrip(np.zeros((1, 9000), np.int64), 16000, tmp_path) < 0.01
    _roundtrip(np.full((2, 5000), -123, np.int64), 8000, tmp_path)


def test_flac_mono_odd_blocksize_nonstandard_rate(tmp_path):
    rng = np.random.default_rng(2)
    walk = np.clip(np.cumsum(rng.integers(-200, 200, 13_001)), -32768, 32767)[None, :]
    _roundtrip(walk.astype(np.int64), 22050, tmp_path, bs=1000)


def test_flac_24bit(tmp_path):
    t = np.arange(20_000)
    x = np.rint(np.sin(2 * np.pi * 100 * t / 44100) * (1 << 22)).astype(np.int64)
    _roundtrip(np.stack([x, -x // 2]), 44100, tmp_path, bits=24)


def test_flac_float_api_matches_wav_quantisation(tmp_path):
    rng = np.random.default_rng(3)
    x = np.tanh(rng.standard_normal((1, 8000))).astype(np.float32) * 0.7
    write_flac(tmp_path / "f.flac", x, 24000)
    dec, sr = read_audio(tmp_path / "f.flac")  # via the dispatcher
    assert sr == 24000
    want = np.clip(np.rint(x * 32768.0), -32768, 32767) / 32768.0
    np.testing.assert_array_equal(dec, want.astype(np.float32))


def test_read_audio_rejects_unsupported_format(tmp_path):
    (tmp_path / "song.wma").write_bytes(b"\x30\x26\xb2\x75" + b"\x00" * 100)
    with pytest.raises(UnsupportedFormatError):
        read_audio(tmp_path / "song.wma")


def test_dataset_fails_fast_on_undecodable_corpus(tmp_path):
    write_wav(tmp_path / "ok.wav", np.zeros(1000, np.float32), 16000)
    (tmp_path / "bad.wma").write_bytes(b"\x30\x26\xb2\x75" + b"\x00" * 100)
    tr = T.val_transform(sampling_rate=16000, hop_length=256, crop_frames=4)
    with pytest.raises(ValueError, match="wma"):
        VocoderDataset(root=tmp_path, transform=tr)


def test_corrupt_flac_fallback_is_counted(tmp_path):
    (tmp_path / "broken.flac").write_bytes(b"fLaC" + b"\x00" * 16)  # truncated
    la = T.LoadAudio(sampling_rate=8000)
    audio = la(np.random.default_rng(0), str(tmp_path / "broken.flac"))
    assert audio.shape == (1, 8000 * 10)
    assert np.all(audio == 0)
    assert la.fallback_count == 1


def test_hostile_subframe_negative_lpc_shift_raises():
    """RFC 9639 reserves negative LPC shifts; both decoders must error, not UB."""
    from vocoder_tpu.data.flac import BitReader, BitWriter, _decode_subframe

    bw = BitWriter()
    bw.write(0, 1)  # padding
    bw.write(32, 6)  # LPC order 1
    bw.write(0, 1)  # no wasted bits
    bw.write_signed(0, 16)  # warmup sample
    bw.write(11, 4)  # precision 12
    bw.write_signed(-1, 5)  # NEGATIVE shift (reserved)
    bw.write_signed(1, 12)  # coefficient
    bw.align()
    with pytest.raises(ValueError, match="shift"):
        _decode_subframe(BitReader(bw.getvalue()), block_size=4, bps=16)


def test_hostile_subframe_wasted_bits_overflow_raises():
    """wasted >= bps leaves no sample bits (and an unbounded << in C++)."""
    from vocoder_tpu.data.flac import BitReader, BitWriter, _decode_subframe

    bw = BitWriter()
    bw.write(0, 1)  # padding
    bw.write(0, 6)  # CONSTANT
    bw.write(1, 1)  # wasted-bits flag
    bw.write_unary(16)  # wasted = 17 > bps = 16
    bw.align()
    with pytest.raises(ValueError, match="wasted"):
        _decode_subframe(BitReader(bw.getvalue()), block_size=4, bps=16)


def test_flac_corpus_trains_end_to_end(tmp_path):
    """A FLAC-only corpus flows through dataset -> mix -> batches (weak #1 done-bar)."""
    rng = np.random.default_rng(4)
    sr = 16000
    for i in range(3):
        tone = 0.4 * np.sin(2 * np.pi * (150 + 80 * i) * np.arange(sr) / sr)
        write_flac(tmp_path / f"clip{i}.flac", tone.astype(np.float32)[None], sr)
    tr = T.train_transform(sampling_rate=sr, hop_length=256, num_frames=8)
    ds = VocoderDataset(root=tmp_path, transform=tr)
    assert len(ds) == 3
    mix = MixDataset(datasets=[ds], probs=[1.0])
    it = batch_iterator(mix.sample, batch_size=2, target_length=256 * 8, seed=1)
    b = next(it)
    assert b["audio"].shape == (2, 1, 256 * 8)
    assert np.abs(b["audio"]).max() > 0.01  # decoded real signal, not silence


def test_batch_iterator_stream_independent_of_num_workers(tmp_path):
    sr = 16000
    for i in range(3):
        tone = 0.4 * np.sin(2 * np.pi * (150 + 80 * i) * np.arange(sr) / sr)
        write_wav(tmp_path / f"clip{i}.wav", tone.astype(np.float32), sr)
    tr = T.train_transform(sampling_rate=sr, hop_length=256, num_frames=8)
    mix = MixDataset(datasets=[VocoderDataset(root=tmp_path, transform=tr)], probs=[1.0])
    kw = dict(batch_size=4, target_length=256 * 8, seed=9, start_step=3)
    serial = batch_iterator(mix.sample, num_workers=1, **kw)
    pooled = batch_iterator(mix.sample, num_workers=4, **kw)
    for _ in range(3):
        a, b = next(serial), next(pooled)
        np.testing.assert_array_equal(a["audio"], b["audio"])
        np.testing.assert_array_equal(a["lengths"], b["lengths"])
