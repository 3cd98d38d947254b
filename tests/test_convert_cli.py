"""convert_ckpt CLI: torch .ckpt -> Orbax params, loadable + numerically equal."""

import sys

import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from fish_vocoder.modules.generators.hifigan import HiFiGANGenerator  # noqa: E402

from tests.test_hifigan_parity import SMALL  # noqa: E402
from vocoder_tpu.models import hifigan  # noqa: E402


def test_convert_ckpt_roundtrip(tmp_path):
    torch.manual_seed(0)
    ref = HiFiGANGenerator(use_template=False, **SMALL)
    ckpt = {"state_dict": {f"generator.{k}": v for k, v in ref.state_dict().items()}}
    src = tmp_path / "ref.ckpt"
    torch.save(ckpt, src)

    import vocoder_tpu.cli.convert_ckpt as cc
    import vocoder_tpu.cli.infer as infer_cli
    from vocoder_tpu.config import build_task_config

    tiny_task = build_task_config("hifigan").replace(generator=hifigan.HiFiGANConfig(**SMALL))
    orig = cc.build_task_config
    cc.build_task_config = lambda *a, **k: tiny_task
    try:
        dst = tmp_path / "out"
        cc.main(["--model", "hifigan", "--src", str(src), "--dst", str(dst), "--fold"])
    finally:
        cc.build_task_config = orig

    params = infer_cli.load_generator_params(str(dst), tiny_task, fold=False)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, SMALL["num_mels"], 7)).astype(np.float32)
    cfg = hifigan.HiFiGANConfig(**SMALL)
    got = np.asarray(hifigan.apply(params, jnp.asarray(mel), cfg))
    with torch.no_grad():
        ref.eval()
        want = ref(torch.from_numpy(mel)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
