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


def _vocos_task(dims, depths, num_frames=8, n_fft=2048, hop=512, dtype="bfloat16"):
    """GANTaskConfig with a vocos generator at the given backbone scale.

    Full mel/STFT resolutions (the real 44.1 kHz analyzers) so the compiled
    program structurally matches production; num_frames kept small so CPU
    execution/compilation is bounded.
    """
    from vocoder_tpu.models import convnext, vocos
    from vocoder_tpu.train.schedule import WarmupCosineConfig

    return gan.GANTaskConfig(
        sampling_rate=44100,
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        num_mels=128,
        generator_name="vocos",
        generator=vocos.VocosConfig(
            backbone=convnext.ConvNeXtConfig(
                input_channels=128, depths=depths, dims=dims, drop_path_rate=0.0
            ),
            head=vocos.ISTFTHeadConfig(dim=dims[-1], n_fft=n_fft, hop_length=hop, win_length=n_fft),
        ),
        mpd=__import__("vocoder_tpu.models.mpd", fromlist=["x"]).MPDConfig(periods=(2, 3)),
        mrd=__import__("vocoder_tpu.models.mrd", fromlist=["x"]).MRDConfig(
            resolutions=((n_fft, hop, n_fft),)
        ),
        stft_resolutions=((n_fft, hop, n_fft),),
        num_frames=num_frames,
        crop_length=hop * 2,
        compute_dtype=dtype,
        schedule=WarmupCosineConfig(val_base=1e-4, max_decay_steps=1000),
    )


def _per_device_bytes(abstract, shardings, mesh):
    from jax.sharding import NamedSharding

    total = per = 0
    for leaf, sh in zip(
        jax.tree.leaves(abstract),
        jax.tree.leaves(shardings, is_leaf=lambda x: isinstance(x, NamedSharding)),
    ):
        n = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        total += n
        shard = 1
        for name in jax.tree.leaves(tuple(sh.spec)):
            shard *= mesh.shape[name]
        per += n // shard
    return total, per


def test_vocos_huge_state_shards_below_chip_hbm(devices):
    """North-star accounting at FULL size: the vocos-huge (650M-param) GAN
    TrainState under explicit Megatron specs fits a 16 GB v5e chip with a
    model=8 mesh, and sharding covers >=75% of bytes (fails if the spec tree
    degrades to replication)."""
    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.parallel.mesh import train_state_specs

    task = build_task_config(model="vocos_huge", resolution="44100_512_2048")
    mesh = make_mesh(data=1, model=8)
    abstract = jax.eval_shape(lambda k: gan.create_train_state(k, task), jax.random.key(0))
    specs = train_state_specs(abstract, mesh, gan.model_param_specs(task))
    total, per = _per_device_bytes(abstract, specs, mesh)
    assert total > 7e9, f"vocos-huge GAN state should be ~8 GB fp32, got {total / 1e9:.2f} GB"
    assert per < 16e9, f"per-device {per / 1e9:.2f} GB exceeds one v5e HBM"
    assert per < total / 4, (
        f"sharding degraded: per-device {per / 1e9:.2f} GB vs total {total / 1e9:.2f} GB "
        "(explicit specs should shard >=75% of bytes at model=8)"
    )


def test_vocos_tp_matches_single_device(devices):
    """Tensor-parallel vocos (explicit specs + activation constraints) is
    numerically the single-device program."""
    task = _vocos_task(dims=(16, 32), depths=(1, 1), num_frames=4, n_fft=32, hop=8, dtype="float32")
    t = task.hop_length * task.num_frames
    rng = np.random.default_rng(1)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 1, t)) * 0.3, jnp.float32),
        "lengths": jnp.full((2,), t, jnp.int32),
    }

    state1 = gan.create_train_state(jax.random.key(0), task)
    _, m1 = jax.jit(gan.make_train_step(task))(state1, batch)

    mesh = make_mesh(data=1, model=4, devices=devices[:4])
    with mesh:
        state2 = gan.create_train_state_sharded(jax.random.key(0), task, mesh)
        _, m2 = jax.jit(gan.make_train_step(task))(state2, batch)

    np.testing.assert_allclose(
        float(m1["train/generator/all"]), float(m2["train/generator/all"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m1["train/discriminator/all"]), float(m2["train/discriminator/all"]), rtol=2e-4
    )


def _allgather_bytes(hlo: str) -> list[tuple[int, str]]:
    """[(result_bytes, line)] for every all-gather in the compiled HLO."""
    import re

    out = []
    for line in hlo.splitlines():
        m = re.search(r"=\s+(\w+)\[([\d,]*)\][^=]*all-gather", line)
        if not m:
            continue
        dtype, dims = m.group(1), m.group(2)
        size = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
        itemsize = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8, "pred": 1}.get(dtype, 4)
        out.append((size * itemsize, line.strip()[:200]))
    return out


def test_vocos_tp_compile_has_no_weight_allgather(devices):
    """Compile (SPMD-partition) the GAN train step with vocos at FULL
    vocos-huge channel widths (352/704/1408/2816, depth-reduced) on a model=8
    mesh and inspect the HLO: no all-gather may materialise a full MLP weight
    (the failure mode VERDICT round-1 flagged: GSPMD silently degrading
    channel sharding to replicate-and-gather).  Also cross-checks the
    compiler's per-device argument bytes against the eval_shape accounting."""
    from vocoder_tpu.parallel.mesh import train_state_specs

    task = _vocos_task(dims=(352, 704, 1408, 2816), depths=(1, 1, 1, 1))
    mesh = make_mesh(data=1, model=8)
    abstract = jax.eval_shape(lambda k: gan.create_train_state(k, task), jax.random.key(0))
    specs = train_state_specs(abstract, mesh, gan.model_param_specs(task))

    t = task.hop_length * task.num_frames
    abs_state = jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s), abstract, specs
    )
    abs_batch = {
        "audio": jax.ShapeDtypeStruct((2, 1, t), jnp.float32, sharding=batch_sharding(mesh)),
        "lengths": jax.ShapeDtypeStruct((2,), jnp.int32, sharding=batch_sharding(mesh)),
    }
    step = jax.jit(gan.make_train_step(task), donate_argnums=0)
    with mesh:
        compiled = step.lower(abs_state, abs_batch).compile()

    # Largest sharded leaf = pwconv 2816x11264 fp32 = 127 MB; any all-gather
    # near that scale means a weight (or its grad/moment) was re-replicated.
    gathers = _allgather_bytes(compiled.as_text())
    big = [(b, l) for b, l in gathers if b > 8 * 1024 * 1024]
    assert not big, f"unexpected large all-gathers: {big[:5]}"

    total, per = _per_device_bytes(abstract, specs, mesh)
    mem = compiled.memory_analysis()
    if mem is not None and getattr(mem, "argument_size_in_bytes", 0):
        assert mem.argument_size_in_bytes < per * 1.1 + 2**20, (
            f"compiled per-device args {mem.argument_size_in_bytes / 1e9:.2f} GB exceed "
            f"the sharded accounting {per / 1e9:.2f} GB — sharding degraded at compile time"
        )


def _upsampler_task(name: str, uic: int = 256, num_frames: int = 8, dtype: str = "float32"):
    """GANTaskConfig with a HiFiGAN/BigVGAN-skeleton generator whose first
    stage is WIDE (C = uic/2 >= 128), so the tensor-parallel region engages."""
    from vocoder_tpu.models import bigvgan, hifigan, mpd, mrd
    from vocoder_tpu.train.schedule import WarmupCosineConfig

    hop = 4
    gen_kw = dict(
        hop_length=hop,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        num_mels=8,
        upsample_initial_channel=uic,
    )
    gen = (
        hifigan.HiFiGANConfig(**gen_kw)
        if name == "hifigan"
        else bigvgan.BigVGANConfig(**gen_kw)
    )
    return gan.GANTaskConfig(
        sampling_rate=8000,
        n_fft=16,
        hop_length=hop,
        win_length=16,
        num_mels=8,
        generator_name=name,
        generator=gen,
        mpd=mpd.MPDConfig(periods=(2, 3), channels=(1, 4, 8)),
        mrd=mrd.MRDConfig(resolutions=((16, 4, 16),)),
        stft_resolutions=((16, 4, 16),),
        num_frames=num_frames,
        crop_length=hop * 2,
        compute_dtype=dtype,
        schedule=WarmupCosineConfig(val_base=1e-4, max_decay_steps=1000),
    )


@pytest.mark.parametrize("name", ["hifigan", "bigvgan"])
def test_upsampler_param_specs_mirror_init_tree(name):
    """Spec trees must mirror init() path-for-path: train_state_specs matches
    by path suffix, so a structural drift silently degrades to the heuristic."""
    from jax.sharding import PartitionSpec as P

    from vocoder_tpu.models.registry import get_generator

    gd = get_generator(name)
    for use_template in (False, True):
        cfg = dataclasses_replace(gd.config_cls(), use_template=use_template)
        params = jax.eval_shape(lambda: gd.init(jax.random.key(0), cfg))
        specs = gd.param_specs(cfg)
        p_paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
        s_paths = [
            p
            for p, _ in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, P)
            )[0]
        ]
        assert p_paths == s_paths, f"{name} use_template={use_template}: spec tree drifted"
        # and the wide first stage actually shards something
        leaves = jax.tree_util.tree_flatten_with_path(specs, is_leaf=lambda x: isinstance(x, P))[0]
        assert any("model" in jax.tree.leaves(tuple(s)) for _, s in leaves if s), name


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


@pytest.mark.parametrize("name", ["hifigan", "bigvgan"])
def test_upsampler_tp_matches_single_device(name, devices):
    """Tensor-parallel HiFiGAN/BigVGAN (explicit specs + shard_channels
    constraints) is numerically the single-device program."""
    task = _upsampler_task(name)
    t = task.hop_length * task.num_frames
    rng = np.random.default_rng(1)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 1, t)) * 0.3, jnp.float32),
        "lengths": jnp.full((2,), t, jnp.int32),
    }

    state1 = gan.create_train_state(jax.random.key(0), task)
    _, m1 = jax.jit(gan.make_train_step(task))(state1, batch)

    mesh = make_mesh(data=1, model=2, devices=devices[:2])
    with mesh:
        state2 = gan.create_train_state_sharded(jax.random.key(0), task, mesh)
        _, m2 = jax.jit(gan.make_train_step(task))(state2, batch)

    np.testing.assert_allclose(
        float(m1["train/generator/all"]), float(m2["train/generator/all"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m1["train/discriminator/all"]), float(m2["train/discriminator/all"]), rtol=2e-4
    )


def test_bigvgan_base_tp_compile_has_no_weight_allgather(devices):
    """Compile the GAN train step with BigVGAN at BASE widths (512-channel
    init, the north-star channel-sharding target) on a model=2 mesh: no
    all-gather may materialise a wide-stage weight/grad/moment."""
    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.parallel.mesh import train_state_specs

    task = build_task_config(model="bigvgan", resolution="44100_512_2048")
    import dataclasses

    task = dataclasses.replace(task, num_frames=8, crop_length=task.hop_length * 2)
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    abstract = jax.eval_shape(lambda k: gan.create_train_state(k, task), jax.random.key(0))
    specs = train_state_specs(abstract, mesh, gan.model_param_specs(task))

    t = task.hop_length * task.num_frames
    abs_state = jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s), abstract, specs
    )
    abs_batch = {
        "audio": jax.ShapeDtypeStruct((2, 1, t), jnp.float32, sharding=batch_sharding(mesh)),
        "lengths": jax.ShapeDtypeStruct((2,), jnp.int32, sharding=batch_sharding(mesh)),
    }
    step = jax.jit(gan.make_train_step(task), donate_argnums=0)
    with mesh:
        compiled = step.lower(abs_state, abs_batch).compile()

    # Largest wide-stage weight: ups[0] (16,512,256) = 2M params -> 8 MB fp32 /
    # 4 MB bf16.  Any all-gather >= 2 MB means a wide weight (or its grad or
    # adam moment) was re-replicated; legit gathers here are KB-scale.
    gathers = _allgather_bytes(compiled.as_text())
    big = [(b, l) for b, l in gathers if b >= 2 * 1024 * 1024]
    assert not big, f"unexpected large all-gathers: {big[:5]}"


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_bench_scaling_harness_runs():
    from vocoder_tpu.cli import bench_scaling

    results = bench_scaling.main(["--meshes", "1,2", "--tiny", "--batch", "2", "--iters", "2"])
    assert len(results) == 2
    assert results[0]["data_parallel"] == 1 and results[1]["data_parallel"] == 2
    assert all(r["audio_s_per_s"] > 0 for r in results)


@pytest.mark.parametrize("name", ["hifigan", "bigvgan"])
def test_model_parallel_inference_matches_single_device(name, devices):
    """r4 (VERDICT r3 #9): weight-norm-FOLDED generator params sharded with
    fold_weight_norm_specs(param_specs) produce the same waveform under a
    model=2 mesh as the single-device forward — the cli/infer.py
    --model-parallel path."""
    from vocoder_tpu import nn
    from vocoder_tpu.models.registry import get_generator
    from vocoder_tpu.parallel.mesh import train_state_specs

    task = _upsampler_task(name)
    gen = get_generator(name)
    params = nn.fold_weight_norm(gen.init(jax.random.key(0), task.generator))
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, task.num_mels, 16)), jnp.float32)

    @jax.jit
    def synth(p, m):
        return gen.apply(p, m, task.generator)

    ref = np.asarray(synth(params, mel))

    mesh = make_mesh(data=1, model=2, devices=devices[:2])
    gen_specs = nn.fold_weight_norm_specs(gen.param_specs(task.generator))
    sharded = jax.tree.map(jax.device_put, params, train_state_specs(params, mesh, gen_specs))
    # at least one folded wide-stage weight must actually be model-sharded
    shardings = jax.tree.leaves(jax.tree.map(lambda l: l.sharding.spec, sharded))
    assert any("model" in jax.tree.leaves(tuple(s)) for s in shardings), name
    with mesh:
        got = np.asarray(synth(sharded, mel))
    np.testing.assert_allclose(got, ref, atol=2e-5)
