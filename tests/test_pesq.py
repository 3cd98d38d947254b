"""Native P.862 (PESQ) validation.

No ITU conformance vectors exist offline, so this validates the published
invariants instead (pesq_native.py docstring): the identity fixed points of
the P.862.1/P.862.2 logistic mappings (4.55 NB / 4.64 WB), monotonic
degradation under additive noise, delay/scale invariance, and range bounds.
"""

import numpy as np
import pytest

from vocoder_tpu.eval_metrics import pesq


@pytest.fixture(scope="module")
def speechish():
    """Speech-like test signal: AM multi-tone with pauses, 4 s @16 kHz."""
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr * 4) / sr
    env = (np.sin(2 * np.pi * 1.5 * t) ** 2) * (np.sin(2 * np.pi * 0.25 * t) > -0.3)
    x = env * (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 800 * t)
        + 0.15 * np.sin(2 * np.pi * 1800 * t)
        + 0.05 * rng.standard_normal(len(t))
    )
    return x.astype(np.float32), sr


def test_identity_fixed_points(speechish):
    x, sr = speechish
    assert pesq(x, x, sr, "wb") == pytest.approx(4.6439, abs=5e-3)
    from vocoder_tpu.data.resample import resample

    x8 = resample(x, sr, 8000)
    assert pesq(x8, x8, 8000, "nb") == pytest.approx(4.5486, abs=5e-3)


def test_monotonic_with_noise(speechish):
    x, sr = speechish
    rng = np.random.default_rng(1)
    sig_p = float(np.mean(x**2))
    scores = []
    for snr in [40, 20, 10]:
        noise = rng.standard_normal(len(x)) * np.sqrt(sig_p * 10 ** (-snr / 10))
        scores.append(pesq(x, x + noise, sr, "wb"))
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[0] > 4.0  # 40 dB SNR is near-transparent
    assert scores[2] < 2.5  # 10 dB SNR is clearly degraded
    assert all(1.0 <= s <= 4.7 for s in scores)


def test_scale_and_delay_invariance(speechish):
    x, sr = speechish
    base = pesq(x, x, sr, "wb")
    assert pesq(x, 0.25 * x, sr, "wb") == pytest.approx(base, abs=0.02)  # level aligned
    delayed = np.concatenate([np.zeros(640, np.float32), x])[: len(x)]
    assert pesq(x, delayed, sr, "wb") == pytest.approx(base, abs=0.2)  # time aligned


def test_distortion_is_penalised(speechish):
    x, sr = speechish
    clipped = np.clip(x, -0.15, 0.15)  # hard clipping distortion
    assert pesq(x, clipped, sr, "wb") < 3.8


def test_mode_and_rate_contract(speechish):
    x, sr = speechish
    with pytest.raises(AssertionError):
        pesq(x, x, sr, "nb")  # nb requires 8 kHz
    with pytest.raises(ValueError):
        pesq(x, x, sr, "superwide")
    with pytest.raises(ValueError):
        pesq(np.zeros(16000, np.float32), np.zeros(16000, np.float32), sr, "wb")  # silence
