"""Objective metric properties: SI-SDR scale invariance, MCD identity."""

import numpy as np

from vocoder_tpu.eval_metrics import mcd, si_sdr


def test_si_sdr_identity_and_scale_invariance():
    rng = np.random.default_rng(0)
    s = rng.standard_normal(8000).astype(np.float32)
    assert si_sdr(s, s) > 70  # near-perfect
    # Scale invariance: scaling the estimate leaves SI-SDR unchanged.
    noisy = s + 0.1 * rng.standard_normal(8000).astype(np.float32)
    a = si_sdr(s, noisy)
    b = si_sdr(s, 3.7 * noisy)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert 15 < a < 25  # ~20 dB for 10% noise


def test_si_sdr_orders_quality():
    rng = np.random.default_rng(1)
    s = np.sin(np.arange(8000) / 10).astype(np.float32)
    slightly = s + 0.01 * rng.standard_normal(8000).astype(np.float32)
    very = s + 0.5 * rng.standard_normal(8000).astype(np.float32)
    assert si_sdr(s, slightly) > si_sdr(s, very)


def test_mcd_identity_and_ordering():
    rng = np.random.default_rng(2)
    s = (0.5 * np.sin(2 * np.pi * 220 * np.arange(24000) / 24000)).astype(np.float32)
    assert mcd(s, s, 24000) < 1e-4
    near = s + 0.01 * rng.standard_normal(len(s)).astype(np.float32)
    far = s + 0.2 * rng.standard_normal(len(s)).astype(np.float32)
    m1, m2 = mcd(s, near, 24000), mcd(s, far, 24000)
    assert 0 < m1 < m2
