"""Fused AMP-stage Pallas kernel (ops/pallas/amp_block.py) parity vs the XLA
folded pipeline, via the interpreter on the CPU test mesh.

Reference semantics: mean over kernel-size blocks of the AMPBlock chain
(reference bigvgan.py:138-252, 361-365) — the oracle here is the in-repo XLA
path (models/bigvgan._amp_apply), itself parity-tested against torch
(tests/test_bigvgan_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vocoder_tpu.models import bigvgan
from vocoder_tpu.models.bigvgan import BigVGANConfig, _amp_apply, _amp_init
from vocoder_tpu.ops.pallas import amp_block


def _stage(key, c, kernel_sizes, dilation_sizes, logscale=True):
    cfg = BigVGANConfig(
        hop_length=4,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=kernel_sizes,
        resblock_dilation_sizes=dilation_sizes,
        num_mels=8,
        upsample_initial_channel=2 * c,
        snake_logscale=logscale,
    )
    keys = jax.random.split(key, len(kernel_sizes))
    blocks = [
        _amp_init(k, c, ks, ds, cfg)
        for k, ks, ds in zip(keys, kernel_sizes, dilation_sizes)
    ]
    return cfg, blocks


def _oracle(blocks, xf, kernel_sizes, dilation_sizes, cfg, fold):
    outs = [
        _amp_apply(blocks[i], xf, kernel_sizes[i], dilation_sizes[i], cfg, False, fold, None)
        for i in range(len(kernel_sizes))
    ]
    return sum(outs) / len(kernel_sizes)


@pytest.mark.parametrize("fir", ["mm", "shuffle", "f2=shuffle,f8=mm"])
@pytest.mark.parametrize("fold", [1, 2, 8])
def test_amp_stage_fused_matches_xla(fold, fir, monkeypatch):
    # All three FIR lowerings (and a mixed per-fold spec) must agree with the
    # XLA oracle; f == 1 ignores the spec (taps are plain row-shifted FMAs).
    monkeypatch.setattr(amp_block, "_FIR_SPEC", amp_block._parse_fir_spec(fir))
    kernel_sizes = (3, 5)
    dilation_sizes = ((1, 2), (1, 3))
    c = 128 // fold
    cfg, blocks = _stage(jax.random.key(0), c, kernel_sizes, dilation_sizes)

    q = 128  # folded rows; T = q * fold samples
    rng = np.random.default_rng(fold)
    xf = jnp.asarray(rng.standard_normal((2, q, 128)) * 0.5, jnp.float32)

    assert amp_block.amp_stage_supported(xf, kernel_sizes, dilation_sizes, fold, interpret=True)
    got = amp_block.amp_stage_fused(
        blocks, xf, kernel_sizes, dilation_sizes, cfg.snake_logscale, fold, interpret=True
    )
    want = _oracle(blocks, xf, kernel_sizes, dilation_sizes, cfg, fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_amp_stage_fused_full_generator():
    """Model integration: BigVGAN apply with the fused backend equals the XLA
    backend end to end (folded tail forced on, interpreter kernel)."""
    cfg = BigVGANConfig(
        hop_length=16,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 3)),
        num_mels=8,
        upsample_initial_channel=64,
    )
    params = bigvgan.init(jax.random.key(1), cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 8, 256)), jnp.float32)

    prev_fold, prev_backend, prev_interp = (
        bigvgan.TAIL_FOLD,
        bigvgan.AMP_BACKEND,
        amp_block.INTERPRET,
    )
    try:
        bigvgan.TAIL_FOLD = "on"
        bigvgan.AMP_BACKEND = "xla"
        want = bigvgan.apply(params, mel, cfg)
        bigvgan.AMP_BACKEND = "fused"
        amp_block.INTERPRET = True
        got = bigvgan.apply(params, mel, cfg)
    finally:
        bigvgan.TAIL_FOLD, bigvgan.AMP_BACKEND, amp_block.INTERPRET = (
            prev_fold,
            prev_backend,
            prev_interp,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_amp_stage_unsupported_shapes_fall_back():
    # L == 256 runs per-block kernels; wider lanes are unsupported
    assert (
        amp_block.amp_stage_supported(jnp.zeros((1, 128, 256)), (3,), ((1, 2),), 1, interpret=True)
        == "block"
    )
    assert (
        amp_block.amp_stage_supported(jnp.zeros((1, 128, 512)), (3,), ((1, 2),), 1, interpret=True)
        is None
    )
    # too short for any tile
    assert (
        amp_block.amp_stage_supported(jnp.zeros((1, 16, 128)), (3,), ((1, 2),), 1, interpret=True)
        is None
    )


def test_amp_block_fused_l256_matches_xla():
    """The wide first stage (L == 256, fold 1) runs one kernel per block;
    each must match the XLA chain."""
    kernel_sizes = (5,)
    dilation_sizes = ((1, 3),)
    cfg, blocks = _stage(jax.random.key(2), 256, kernel_sizes, dilation_sizes)
    rng = np.random.default_rng(9)
    xf = jnp.asarray(rng.standard_normal((1, 128, 256)) * 0.5, jnp.float32)
    got = amp_block.amp_stage_fused(
        blocks, xf, kernel_sizes, dilation_sizes, cfg.snake_logscale, 1, interpret=True
    )
    want = _oracle(blocks, xf, kernel_sizes, dilation_sizes, cfg, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_poly_sin_accuracy():
    """The range-reduced polynomial sin^2/sin (ops/antialias) must stay
    within 1e-7 of libm over a wide argument range — far below bf16 output
    precision and the fp32 parity-test tolerances."""
    from vocoder_tpu.ops import antialias as aa

    w = jnp.asarray(np.linspace(-300.0, 300.0, 400001), jnp.float32)
    w64 = np.asarray(w).astype(np.float64)  # the fp32-quantised arguments
    # ~5e-7 worst case = fp32 half-ulp of the reduction at |w| ~ 16 —
    # 4 orders below the bf16 output quantum (4e-3 relative)
    np.testing.assert_allclose(np.asarray(aa.sin_sq(w)), np.sin(w64) ** 2, atol=6e-7)
    np.testing.assert_allclose(np.asarray(aa.fast_sin(w)), np.sin(w64), atol=6e-7)
