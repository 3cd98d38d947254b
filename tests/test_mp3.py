"""MP3 data-path tests (VERDICT round-2 missing #1).

The reference's LoadAudio accepts .mp3 via torchaudio
(fish_vocoder/data/transforms/load.py:16-23); here decode goes through the
libmpg123 binding (vocoder_tpu/data/mp3.py).  Validation fixture strategy:
libmp3lame encodes known signals, the decoder must reproduce them gaplessly
within a documented psychoacoustic tolerance.  Everything is skipped cleanly
when the system libraries are absent (then .mp3 stays undecodable and the
fail-fast construction path from test_flac.py applies).
"""

import numpy as np
import pytest

from vocoder_tpu.data import transforms as T
from vocoder_tpu.data.dataset import MixDataset, VocoderDataset, batch_iterator
from vocoder_tpu.data.mp3 import decoder_available, encoder_available, read_mp3, write_mp3

needs_codec = pytest.mark.skipif(
    not (decoder_available() and encoder_available()),
    reason="system libmpg123/libmp3lame not present",
)


def _tone(sr: int, seconds: float, freqs=(440.0, 1321.0), amps=(0.5, 0.2)) -> np.ndarray:
    t = np.arange(int(sr * seconds))
    x = sum(a * np.sin(2 * np.pi * f * t / sr) for f, a in zip(freqs, amps))
    return x.astype(np.float32)


@needs_codec
def test_mp3_roundtrip_gapless_and_faithful(tmp_path):
    """Encode->decode must be length-exact (LAME tag honoured) and >=25 dB SNR
    on tonal content — a transparent-bitrate bound, loose enough for any
    compliant encoder/decoder pair, tight enough to catch mis-scaling,
    channel swaps, or misalignment."""
    sr = 44100
    x = _tone(sr, 2.0)
    write_mp3(tmp_path / "t.mp3", x, sr)
    y, ysr = read_mp3(tmp_path / "t.mp3")
    assert ysr == sr and y.shape == (1, x.size)
    err = y[0] - x
    snr = 10 * np.log10(np.mean(x**2) / np.mean(err**2))
    assert snr > 25.0, f"mp3 roundtrip SNR {snr:.1f} dB"


@needs_codec
def test_mp3_stereo_and_rates(tmp_path):
    for sr in (24000, 32000, 44100):
        x = np.stack([_tone(sr, 0.5), _tone(sr, 0.5, freqs=(554.0,), amps=(0.4,))])
        write_mp3(tmp_path / f"s{sr}.mp3", x, sr)
        y, ysr = read_mp3(tmp_path / f"s{sr}.mp3")
        assert ysr == sr and y.shape == x.shape
        for c in range(2):
            snr = 10 * np.log10(np.mean(x[c] ** 2) / np.mean((y[c] - x[c]) ** 2))
            assert snr > 20.0, (sr, c, snr)


@needs_codec
def test_mp3_via_read_audio_dispatcher(tmp_path):
    from vocoder_tpu.data.audio_io import DECODABLE_EXTENSIONS, read_audio

    assert ".mp3" in DECODABLE_EXTENSIONS
    sr = 32000
    write_mp3(tmp_path / "d.mp3", _tone(sr, 0.5), sr)
    y, ysr = read_audio(tmp_path / "d.mp3")
    assert ysr == sr and y.dtype == np.float32 and y.ndim == 2


@needs_codec
def test_corrupt_mp3_is_counted_fallback(tmp_path):
    """Garbage bytes under .mp3: recoverable per-file fallback, like FLAC."""
    (tmp_path / "broken.mp3").write_bytes(b"\xff\xfb" + bytes(range(256)) * 4)
    la = T.LoadAudio(sampling_rate=8000)
    audio = la(np.random.default_rng(0), str(tmp_path / "broken.mp3"))
    assert audio.shape == (1, 8000 * 10)
    assert np.all(audio == 0)
    assert la.fallback_count == 1


@needs_codec
def test_mp3_corpus_trains_end_to_end(tmp_path):
    """An mp3-only corpus flows through dataset -> mix -> batches (the
    reference's shipped 8000 h mix is mixed-format, configs/data/vocoder.yaml)."""
    sr = 32000
    for i in range(3):
        write_mp3(tmp_path / f"clip{i}.mp3", _tone(sr, 1.0, freqs=(150.0 + 80 * i,), amps=(0.4,)), sr)
    tr = T.train_transform(sampling_rate=sr, hop_length=256, num_frames=8)
    ds = VocoderDataset(root=tmp_path, transform=tr)
    assert len(ds) == 3
    mix = MixDataset(datasets=[ds], probs=[1.0])
    it = batch_iterator(mix.sample, batch_size=2, target_length=256 * 8, seed=1)
    b = next(it)
    assert b["audio"].shape == (2, 1, 256 * 8)
    assert np.abs(b["audio"]).max() > 0.01


@needs_codec
def test_concatenated_mp3_format_change_errors_not_corrupts(tmp_path):
    """`cat a.mp3 b.mp3` with different formats: mpg123 resyncs and emits a
    second NEW_FORMAT; joining the chunks would interleave the first
    segment's samples across fake channels and mislabel its rate.  read_mp3
    must raise ValueError (counted-fallback semantics), not return corrupt
    audio."""
    write_mp3(tmp_path / "a.mp3", _tone(44100, 0.5), 44100)
    stereo = np.stack([_tone(48000, 0.5), _tone(48000, 0.5, freqs=(250.0,), amps=(0.4,))])
    write_mp3(tmp_path / "b.mp3", stereo, 48000)
    blob = (tmp_path / "a.mp3").read_bytes() + (tmp_path / "b.mp3").read_bytes()
    (tmp_path / "cat.mp3").write_bytes(blob)
    with pytest.raises(ValueError, match="format"):
        read_mp3(tmp_path / "cat.mp3")
