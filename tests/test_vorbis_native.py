"""Self-contained Vorbis decoder (data/vorbis.py) vs the libvorbisfile oracle.

Fixtures are encoded with the in-repo libvorbisenc binding (data/ogg.py
write_ogg) across the setups libvorbis actually emits — long/short block
mixes, stereo square-polar coupling, residue types 1 and 2, lookup-1 lattice
codebooks (low rates), silence (unused floors) — and decoded with BOTH
decoders.  Parity is sample-exact in length and allclose in PCM (the
residual is libvorbis's float32 MDCT vs the float64 math here; measured
max |diff| is ~3e-7 on every fixture class).

Mirrors the FLAC strategy (tests/test_flac.py): spec implementation + system
oracle + hostile-input guards.  Reference counterpart: the torchaudio system
codec dependence in fish_vocoder/data/transforms/load.py:16-23.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vocoder_tpu.data.ogg import (
    encoder_available,
    read_ogg,
    system_decoder_available,
    write_ogg,
)
from vocoder_tpu.data.vorbis import _ogg_crc, decode_ogg_vorbis, read_ogg_pure

needs_xiph = pytest.mark.skipif(
    not (system_decoder_available() and encoder_available()),
    reason="system libvorbis not available to build/oracle fixtures",
)

ATOL = 5e-6  # observed ~3e-7; leave an order of headroom


def _signal(sr: float, seconds: float, seed: int, stereo: bool = False):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * rng.uniform(100, 400) * t) * np.exp(-t)
        + 0.15 * np.sin(2 * np.pi * rng.uniform(800, 2000) * t + 1.0)
        + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)
    if stereo:
        return np.stack([x, np.roll(x, 64) * 0.8]).astype(np.float32)
    return x


def _both(path):
    ref, r1 = read_ogg(path)
    got, r2 = read_ogg_pure(path)
    assert r1 == r2
    assert ref.shape == got.shape, (ref.shape, got.shape)
    assert np.abs(ref - got).max() < ATOL
    return ref


@needs_xiph
@pytest.mark.parametrize(
    "sr,stereo,quality",
    [
        (44100, False, 0.6),  # long/short mix, residue 2
        (44100, True, 0.2),  # stereo coupling, low quality
        (44100, True, 0.8),  # stereo coupling, high quality
        (22050, False, 0.4),
        (8000, False, 0.5),  # single-blocksize mode, residue 1, lookup-1 books
    ],
)
def test_parity_vs_libvorbisfile(tmp_path, sr, stereo, quality):
    x = _signal(sr, 0.5, seed=sr + int(stereo))
    if stereo:
        x = _signal(sr, 0.5, seed=sr, stereo=True)
    path = tmp_path / "clip.ogg"
    write_ogg(path, x, sr, quality=quality)
    ref = _both(path)
    # lossy round-trip sanity: length exact, content correlated
    assert ref.shape[-1] == x.shape[-1]


@needs_xiph
def test_silence_sections_unused_floors(tmp_path):
    x = _signal(44100, 0.6, seed=7)
    x[5000:20000] = 0.0
    path = tmp_path / "sil.ogg"
    write_ogg(path, x, 44100, quality=0.3)
    _both(path)


def _reserial(data: bytes, new_serial: int) -> bytes:
    """Rewrite an Ogg stream's serial number (+ CRCs) to build valid chains."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        nsegs = data[pos + 26]
        body = sum(data[pos + 27 : pos + 27 + nsegs])
        end = pos + 27 + nsegs + body
        page = bytearray(data[pos:end])
        page[14:18] = struct.pack("<I", new_serial)
        page[22:26] = b"\x00\x00\x00\x00"
        page[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
        out += page
        pos = end
    return bytes(out)


@needs_xiph
def test_chained_same_format_decodes(tmp_path):
    a, b = tmp_path / "a.ogg", tmp_path / "b.ogg"
    write_ogg(a, _signal(22050, 0.3, 1, stereo=True), 22050, quality=0.3)
    write_ogg(b, _signal(22050, 0.4, 2, stereo=True), 22050, quality=0.7)
    chain = tmp_path / "chain.ogg"
    chain.write_bytes(a.read_bytes() + _reserial(b.read_bytes(), 0xBEEF))
    ref = _both(chain)
    assert ref.shape[0] == 2


@needs_xiph
def test_chained_format_change_raises(tmp_path):
    a, b = tmp_path / "a.ogg", tmp_path / "b.ogg"
    write_ogg(a, _signal(22050, 0.3, 1, stereo=True), 22050, quality=0.3)
    write_ogg(b, _signal(44100, 0.3, 2), 44100, quality=0.3)
    chain = tmp_path / "chain.ogg"
    chain.write_bytes(a.read_bytes() + _reserial(b.read_bytes(), 0xCAFE))
    with pytest.raises(ValueError, match="changes format"):
        read_ogg_pure(chain)


@needs_xiph
def test_crc_corruption_raises(tmp_path):
    path = tmp_path / "c.ogg"
    write_ogg(path, _signal(22050, 0.3, 3), 22050, quality=0.5)
    data = bytearray(path.read_bytes())
    data[len(data) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg_vorbis(bytes(data), "corrupt")


@needs_xiph
def test_truncated_stream_decodes_prefix(tmp_path):
    """A mid-page truncation drops the tail pages but keeps earlier audio."""
    path = tmp_path / "t.ogg"
    write_ogg(path, _signal(22050, 2.0, 4), 22050, quality=0.5)
    data = path.read_bytes()
    full, _ = read_ogg_pure(path)
    got, _ = decode_ogg_vorbis(data[: int(len(data) * 0.7)], "trunc")
    assert 0 < got.shape[1] < full.shape[1]
    assert np.abs(full[:, : got.shape[1]] - got).max() < ATOL


def test_not_ogg_raises():
    with pytest.raises(ValueError):
        decode_ogg_vorbis(b"RIFF" + b"\x00" * 100, "noise")
    with pytest.raises(ValueError):
        decode_ogg_vorbis(b"", "empty")


@needs_xiph
def test_floor1_inverse_db_table_matches_system_lib():
    """The embedded §10.1 table must match the one compiled into libvorbis
    (normative constant data; guards against transcription typos)."""
    import ctypes.util
    from pathlib import Path

    from vocoder_tpu.data.vorbis import FLOOR1_INVERSE_DB

    cand = None
    for d in ("/usr/lib/x86_64-linux-gnu", "/lib/x86_64-linux-gnu", "/usr/lib", "/usr/local/lib"):
        for p in Path(d).glob("libvorbis.so*") if Path(d).exists() else []:
            if p.is_file():
                cand = p
    if cand is None:
        pytest.skip("no libvorbis binary to compare against")
    blob = np.frombuffer(cand.read_bytes(), np.uint8)
    f = blob[: len(blob) // 4 * 4].view(np.float32)
    starts = np.where(f == FLOOR1_INVERSE_DB[0])[0]
    assert any(
        len(f[i : i + 256]) == 256 and bool((f[i : i + 256] == FLOOR1_INVERSE_DB).all())
        for i in starts
    )
