"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4b).

The reference cannot test its DDP path without GPUs; here the full GAN train
step runs sharded (dp x tp) on fake devices, and pure-DP results are checked
against the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_gan_step import tiny_cfg
from vocoder_tpu.parallel import batch_sharding, make_mesh, shard_train_state
from vocoder_tpu.train import gan


@pytest.fixture(scope="module")
def devices():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return jax.devices()


def _batch(cfg, b=4):
    t = cfg.hop_length * cfg.num_frames
    rng = np.random.default_rng(0)
    return {
        "audio": jnp.asarray(rng.standard_normal((b, 1, t)) * 0.3, jnp.float32),
        "lengths": jnp.full((b,), t, jnp.int32),
    }


def test_dp_mesh_matches_single_device(devices):
    cfg = tiny_cfg()
    batch = _batch(cfg, b=4)

    # Single device.
    state1 = gan.create_train_state(jax.random.key(0), cfg)
    step1 = jax.jit(gan.make_train_step(cfg))
    _, m1 = step1(state1, batch)

    # 4-way data parallel.
    mesh = make_mesh(data=4, model=1, devices=devices[:4])
    state2 = gan.create_train_state(jax.random.key(0), cfg)
    state2 = shard_train_state(state2, mesh)
    sbatch = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch.items()}
    step2 = jax.jit(gan.make_train_step(cfg))
    _, m2 = step2(state2, sbatch)

    np.testing.assert_allclose(
        float(m1["train/generator/all"]), float(m2["train/generator/all"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["train/discriminator/all"]), float(m2["train/discriminator/all"]), rtol=1e-4
    )


def test_dp_x_tp_mesh_runs(devices):
    cfg = tiny_cfg()
    mesh = make_mesh(data=4, model=2)
    state = gan.create_train_state(jax.random.key(0), cfg)
    state = shard_train_state(state, mesh)
    batch = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in _batch(cfg, b=4).items()}
    step = jax.jit(gan.make_train_step(cfg), donate_argnums=0)
    state, metrics = step(state, batch)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["train/generator/all"]))
    assert np.isfinite(float(metrics["train/discriminator/all"]))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_bench_scaling_harness_runs():
    from vocoder_tpu.cli import bench_scaling

    results = bench_scaling.main(["--meshes", "1,2", "--tiny", "--batch", "2", "--iters", "2"])
    assert len(results) == 2
    assert results[0]["data_parallel"] == 1 and results[1]["data_parallel"] == 2
    assert all(r["audio_s_per_s"] > 0 for r in results)
