"""Allclose parity: vocoder_tpu Vocos (ConvNeXt + ISTFTHead) vs torch oracles.

ConvNeXtEncoder oracle is imported from /root/reference; ISTFTHead oracle is
reconstructed in tests/oracles.py (the external `vocos` package is absent).
BASELINE.md config 2.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from fish_vocoder.modules.encoders.convnext import ConvNeXtEncoder  # noqa: E402

from tests.oracles import TorchISTFTHead  # noqa: E402
from vocoder_tpu.models import convnext, vocos  # noqa: E402

CN = dict(input_channels=20, depths=(2, 3), dims=(32, 48), drop_path_rate=0.0, kernel_size=7)


def test_convnext_matches_torch_reference():
    torch.manual_seed(0)
    ref = ConvNeXtEncoder(
        input_channels=CN["input_channels"],
        depths=list(CN["depths"]),
        dims=list(CN["dims"]),
        drop_path_rate=0.0,
        kernel_size=7,
    )
    ref.eval()
    cfg = convnext.ConvNeXtConfig(**CN)
    params = convnext.from_torch_state_dict(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, CN["input_channels"], 17)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, C, T)

    got = np.asarray(convnext.apply(params, jnp.asarray(x).transpose(0, 2, 1), cfg))
    got = got.transpose(0, 2, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_istft_head_matches_oracle():
    torch.manual_seed(1)
    dim, n_fft, hop = 48, 128, 32
    ref = TorchISTFTHead(dim, n_fft, hop, n_fft)
    ref.eval()

    cfg = vocos.ISTFTHeadConfig(dim=dim, n_fft=n_fft, hop_length=hop, win_length=n_fft)
    params = vocos.istft_head_from_torch(ref.state_dict())

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, dim, 11)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    got = np.asarray(vocos.istft_head_apply(params, jnp.asarray(x).transpose(0, 2, 1), cfg))
    assert got.shape == want.shape == (2, 11 * hop)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_full_vocos_generator_matches_composed_oracle():
    torch.manual_seed(2)
    n_mels, n_fft, hop = 20, 128, 32
    backbone = ConvNeXtEncoder(
        input_channels=n_mels, depths=[2, 2], dims=[32, 48], drop_path_rate=0.0, kernel_size=7
    )
    head = TorchISTFTHead(48, n_fft, hop, n_fft)
    backbone.eval(), head.eval()

    cfg = vocos.VocosConfig(
        backbone=convnext.ConvNeXtConfig(input_channels=n_mels, depths=(2, 2), dims=(32, 48)),
        head=vocos.ISTFTHeadConfig(dim=48, n_fft=n_fft, hop_length=hop, win_length=n_fft),
    )
    sd = {f"backbone.{k}": v for k, v in backbone.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    params = vocos.from_torch_state_dict(sd, cfg)

    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, n_mels, 13)).astype(np.float32)
    with torch.no_grad():
        want = head(backbone(torch.from_numpy(mel))).numpy()[:, None, :]

    got = np.asarray(vocos.apply(params, jnp.asarray(mel), cfg))
    assert got.shape == want.shape == (2, 1, 13 * hop)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_vocos_init_and_droppath_run():
    cfg = vocos.VocosConfig(
        backbone=convnext.ConvNeXtConfig(input_channels=8, depths=(1, 1), dims=(16, 24), drop_path_rate=0.2),
        head=vocos.ISTFTHeadConfig(dim=24, n_fft=64, hop_length=16, win_length=64),
    )
    params = vocos.init(jax.random.key(0), cfg)
    mel = jnp.zeros((1, 8, 6))
    out = vocos.apply(params, mel, cfg, training=True, rng=jax.random.key(1))
    assert out.shape == (1, 1, 96)


def test_istft_head_noninteger_hop_ratio():
    # Resolution 24000_2048_3072 (configs/model/resolution/24000_2048_3072.yaml):
    # n_fft=3072, hop=2048 -> 3072 % 2048 != 0, exercising the general
    # anti-diagonal-kernel overlap-add path.
    torch.manual_seed(3)
    dim, n_fft, hop = 16, 96, 64
    ref = TorchISTFTHead(dim, n_fft, hop, n_fft)
    ref.eval()
    cfg = vocos.ISTFTHeadConfig(dim=dim, n_fft=n_fft, hop_length=hop, win_length=n_fft)
    params = vocos.istft_head_from_torch(ref.state_dict())

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, dim, 9)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(vocos.istft_head_apply(params, jnp.asarray(x).transpose(0, 2, 1), cfg))
    assert got.shape == want.shape == (1, 9 * hop)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_vocos_huge_shapes_and_param_count():
    """North-star config (vocos-huge, configs/model/generator/vocos-huge.yaml):
    validate the full parameter tree and forward shapes WITHOUT allocating
    the ~650M params, via jax.eval_shape."""
    cfg = vocos.VocosConfig.huge()
    params_shape = jax.eval_shape(lambda k: vocos.init(k, cfg), jax.random.key(0))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params_shape))
    assert 4e8 < n_params < 1e9, n_params  # largest model in the repo

    out = jax.eval_shape(
        lambda p, m: vocos.apply(p, m, cfg), params_shape, jax.ShapeDtypeStruct((2, 128, 32), jnp.float32)
    )
    assert out.shape == (2, 1, 32 * 512)


def test_vocos_masked_variable_length_batching_exact():
    """frame_lengths batching through ConvNeXt + the per-item iSTFT envelope:
    each row of a right-zero-padded batch equals its unbatched forward."""
    import jax
    import jax.numpy as jnp

    from vocoder_tpu.models import convnext, vocos

    cfg = vocos.VocosConfig(
        backbone=convnext.ConvNeXtConfig(input_channels=8, depths=(1, 1), dims=(16, 32), drop_path_rate=0.0),
        head=vocos.ISTFTHeadConfig(dim=32, n_fft=64, hop_length=16, win_length=64),
    )
    p = vocos.init(jax.random.key(0), cfg)
    f1, f2 = 11, 16
    m1 = jax.random.normal(jax.random.key(1), (1, 8, f1))
    m2 = jax.random.normal(jax.random.key(2), (1, 8, f2))
    y1 = vocos.apply(p, m1, cfg)
    y2 = vocos.apply(p, m2, cfg)
    batch = jnp.concatenate([jnp.pad(m1, ((0, 0), (0, 0), (0, f2 - f1))), m2])
    yb = vocos.apply(p, batch, cfg, frame_lengths=jnp.asarray([f1, f2]))
    np.testing.assert_array_equal(np.asarray(yb[0:1, :, : f1 * 16]), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(yb[1:2]), np.asarray(y2))
