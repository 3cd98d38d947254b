"""Data pipeline tests: WAV I/O, resampler, transforms, datasets, batching."""

import math

import numpy as np
import pytest

from vocoder_tpu.data import transforms as T
from vocoder_tpu.data.audio_io import list_audio_files, read_wav, write_wav
from vocoder_tpu.data.dataset import MixDataset, VocoderDataset, batch_iterator
from vocoder_tpu.data.resample import resample


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        sr = 22050
        t = np.arange(sr)  # 1 s
        wave = 0.5 * np.sin(2 * np.pi * (200 + 100 * i) * t / sr)
        write_wav(tmp_path / f"clip{i}.wav", wave.astype(np.float32), sr)
    (tmp_path / "noise.txt").write_text("not audio")
    return tmp_path


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = np.tanh(rng.standard_normal((2, 1000))).astype(np.float32) * 0.8
    write_wav(tmp_path / "x.wav", x, 16000)
    y, sr = read_wav(tmp_path / "x.wav")
    assert sr == 16000
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-6)


def test_resample_length_and_tone():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert y.shape[-1] == math.ceil(sr_out * len(x) / sr_in)
    # The resampled signal should still be a 440 Hz tone: compare against the
    # analytically expected waveform (ignore filter edges).
    ty = np.arange(len(y)) / sr_out
    want = np.sin(2 * np.pi * 440 * ty)
    m = 200
    corr = np.corrcoef(y[m:-m], want[m:-m])[0, 1]
    assert corr > 0.999, corr


def test_resample_identity():
    x = np.random.default_rng(2).standard_normal(1234).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 24000, 24000), x)


def test_transforms_chain(wav_dir):
    tr = T.train_transform(sampling_rate=16000, hop_length=256, num_frames=16)
    rng = np.random.default_rng(3)
    audio = tr(rng, str(wav_dir / "clip0.wav"))
    assert audio.ndim == 2 and audio.shape[0] == 1
    assert audio.shape[-1] % 256 == 0
    assert audio.shape[-1] <= 256 * 16 + 256  # crop + pad-to-multiple


def test_load_audio_corrupt_fallback(wav_dir):
    la = T.LoadAudio(sampling_rate=8000)
    audio = la(np.random.default_rng(0), str(wav_dir / "noise.txt"))
    assert audio.shape == (1, 8000 * 10)
    assert np.all(audio == 0)


def test_pad_modes():
    pad = T.Pad(multiple_of=100)
    x = np.ones((1, 250), np.float32)
    y = pad(np.random.default_rng(0), x)
    assert y.shape[-1] == 300
    pad2 = T.Pad(target_length=400)
    assert pad2(np.random.default_rng(0), x).shape[-1] == 400


def test_dataset_and_mix_and_batches(wav_dir):
    tr = T.val_transform(sampling_rate=16000, hop_length=256, crop_frames=8)
    ds = VocoderDataset(root=wav_dir, transform=tr)
    assert len(ds) == 3
    mix = MixDataset(datasets=[ds, ds], probs=[3.0, 1.0])

    target = 256 * 8
    it = batch_iterator(mix.sample, batch_size=4, target_length=target, seed=7)
    b1 = next(it)
    assert b1["audio"].shape == (4, 1, target)
    assert b1["lengths"].shape == (4,)
    assert (b1["lengths"] <= target).all()

    # Reproducible from a step offset (resume determinism, unlike reference Q5).
    it_a = batch_iterator(mix.sample, batch_size=2, target_length=target, seed=7, start_step=5)
    it_b = batch_iterator(mix.sample, batch_size=2, target_length=target, seed=7, start_step=5)
    np.testing.assert_array_equal(next(it_a)["audio"], next(it_b)["audio"])

    # Different hosts draw different data.
    it_c = batch_iterator(mix.sample, batch_size=2, target_length=target, seed=7, host_index=1, start_step=5)
    it_d = batch_iterator(mix.sample, batch_size=2, target_length=target, seed=7, host_index=0, start_step=5)
    assert not np.array_equal(next(it_c)["audio"], next(it_d)["audio"])


def test_list_audio_files(wav_dir):
    files = list_audio_files(wav_dir)
    assert len(files) == 3
    assert all(f.suffix == ".wav" for f in files)
