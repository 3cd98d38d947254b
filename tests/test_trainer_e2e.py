"""End-to-end: train loop + checkpoint/auto-resume + infer CLI + eval CLI."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from tests.test_gan_step import tiny_cfg
from vocoder_tpu.config import DataConfig, RunConfig, TrainConfig, apply_overrides, build_task_config
from vocoder_tpu.data.audio_io import write_wav


@pytest.fixture()
def wav_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.default_rng(0)
    sr = 8000
    for i in range(4):
        t = np.arange(sr // 2)
        wave = 0.4 * np.sin(2 * np.pi * (150 + 60 * i) * t / sr) + 0.05 * rng.standard_normal(len(t))
        write_wav(d / f"c{i}.wav", wave.astype(np.float32), sr)
    return d


def _train_cfg(wav_dir, workdir, max_steps=4):
    task = tiny_cfg(crop=False)
    return TrainConfig(
        task=task,
        data=DataConfig(
            train_roots=(str(wav_dir),),
            train_probs=(1.0,),
            val_root=str(wav_dir),
            batch_size=2,
            val_batch_size=2,
            val_crop_frames=16,
        ),
        run=RunConfig(
            max_steps=max_steps,
            val_interval=2,
            ckpt_interval=2,
            log_interval=1,
            data_parallel=2,
            workdir=str(workdir),
        ),
    )


def test_train_loop_checkpoints_and_resumes(wav_dir, tmp_path):
    from vocoder_tpu.train.trainer import train

    workdir = tmp_path / "run"
    cfg = _train_cfg(wav_dir, workdir, max_steps=3)
    state = train(cfg)
    assert int(state.step) == 3
    assert (workdir / "metrics.jsonl").exists()
    lines = [json.loads(line) for line in (workdir / "metrics.jsonl").read_text().splitlines()]
    assert any("train/generator/all" in rec for rec in lines)
    assert any("val/metrics/mel" in rec for rec in lines)

    # Auto-resume continues from the saved step — including when the saved
    # config.json predates a newly-added GANTaskConfig field (schema
    # evolution must not trip the mismatch guard).
    cfg_json = json.loads((workdir / "config.json").read_text())
    cfg_json["task"].pop("spectral_precision")
    (workdir / "config.json").write_text(json.dumps(cfg_json))
    cfg2 = _train_cfg(wav_dir, workdir, max_steps=5)
    state2 = train(cfg2)
    assert int(state2.step) == 5

    # Resuming the same workdir with a DIFFERENT task config must fail with a
    # clear message naming the mismatch, not a deep Orbax tree error.
    cfg3 = _train_cfg(wav_dir, workdir, max_steps=6)
    cfg3 = dataclasses.replace(cfg3, task=cfg3.task.replace(mel_weight=99.0))
    with pytest.raises(SystemExit, match="different task config"):
        train(cfg3)


def test_infer_cli_roundtrip(wav_dir, tmp_path):
    from vocoder_tpu.train.trainer import train

    workdir = tmp_path / "run"
    cfg = _train_cfg(wav_dir, workdir, max_steps=1)
    train(cfg)

    # Monkeypatch the task config used by the CLI to the tiny one.
    import vocoder_tpu.cli.infer as infer_cli

    tiny = cfg.task
    orig = infer_cli.build_task_config
    infer_cli.build_task_config = lambda *a, **k: tiny
    # Stereo input runs channels as a batch (test.py:56-60 semantics).
    stereo = np.stack([np.sin(np.arange(4000) / 20), np.cos(np.arange(4000) / 30)]).astype(np.float32) * 0.4
    write_wav(wav_dir / "stereo.wav", stereo, 8000)
    # Precomputed-mel input (synthesised by both the per-file and batch paths).
    rng = np.random.default_rng(3)
    np.save(wav_dir / "pre.npy", rng.standard_normal((1, tiny.num_mels, 9)).astype(np.float32))
    try:
        out_dir = tmp_path / "out"
        infer_cli.main(
            [
                "--model",
                "hifigan",
                "--ckpt",
                str(workdir / "checkpoints"),
                "--input",
                str(wav_dir),
                "--output",
                str(out_dir),
            ]
        )
        outs = sorted(out_dir.glob("*.wav"))
        assert len(outs) == 6
        from vocoder_tpu.data.audio_io import read_wav

        audio, sr = read_wav(outs[0])
        assert sr == tiny.sampling_rate
        assert audio.shape[-1] > 0
        stereo_out, _ = read_wav(out_dir / "stereo.wav")
        assert stereo_out.shape[0] == 2

        # --batch N (exact masked batching) must reproduce the per-file
        # outputs bit for bit, including the shorter stereo file.
        out_b = tmp_path / "out_batched"
        infer_cli.main(
            [
                "--model", "hifigan",
                "--ckpt", str(workdir / "checkpoints"),
                "--input", str(wav_dir),
                "--output", str(out_b),
                "--batch", "3",
            ]
        )
        for f in outs:
            a, _ = read_wav(f)
            b, _ = read_wav(out_b / f.name)
            np.testing.assert_array_equal(a, b)

        # --model-parallel 2 (r4): sharded generator, same waveforms.  The
        # tiny model's stages all replicate under the explicit specs, so this
        # checks the CLI wiring (mesh context, spec folding, device_put);
        # real channel sharding is covered by
        # test_sharding.py::test_model_parallel_inference_matches_single_device.
        out_mp = tmp_path / "out_mp"
        infer_cli.main(
            [
                "--model", "hifigan",
                "--ckpt", str(workdir / "checkpoints"),
                "--input", str(wav_dir),
                "--output", str(out_mp),
                "--model-parallel", "2",
            ]
        )
        for f in outs:
            a, _ = read_wav(f)
            b, _ = read_wav(out_mp / f.name)
            np.testing.assert_allclose(a, b, atol=1e-6)
    finally:
        infer_cli.build_task_config = orig


def test_evaluate_cli(wav_dir, tmp_path):
    from vocoder_tpu.cli.evaluate import main as eval_main

    # Self-comparison: spec_diff must be ~0.
    scores = eval_main([str(wav_dir), str(wav_dir), "--sr", "8000", "--is-instrumental"])
    assert "spec_diff" in scores
    assert scores["spec_diff"] < 1e-5

    # The parallel path (spawn pool, forced-CPU workers) must agree.
    par = eval_main([str(wav_dir), str(wav_dir), "--sr", "8000", "--is-instrumental", "--workers", "2"])
    assert par["spec_diff"] < 1e-5
    assert abs(par["si_sdr"] - scores["si_sdr"]) < 1e-3


def test_config_overrides():
    cfg = TrainConfig(task=build_task_config("hifigan"))
    cfg = apply_overrides(
        cfg,
        [
            "run.max_steps=123",
            "data.batch_size=4",
            "task.mel_weight=10.0",
            "task.generator.upsample_initial_channel=256",
        ],
    )
    assert cfg.run.max_steps == 123
    assert cfg.data.batch_size == 4
    assert cfg.task.mel_weight == 10.0
    assert cfg.task.generator.upsample_initial_channel == 256


def test_build_task_config_presets():
    for model in ["hifigan", "vocos", "vocos_huge"]:
        task = build_task_config(model, "44100_512_2048")
        assert task.hop_length == 512
        assert task.stft_resolutions[0] == (2048, 512, 2048)
    t24 = build_task_config("hifigan", "24000_256_1024")
    assert t24.sampling_rate == 24000 and t24.num_mels == 100
    assert dataclasses.is_dataclass(t24.generator)
    # ADVICE r4: hyphenated CLI spellings normalize to the underscore presets.
    assert build_task_config("vocos-huge").generator == build_task_config("vocos_huge").generator
    with pytest.raises(KeyError, match="unknown generator preset"):
        build_task_config("no_such_model")


def test_upsample_rates_factorization():
    from math import prod

    from vocoder_tpu.config import upsample_rates_for_hop

    for hop in [512, 256, 2048, 640, 100, 960]:
        rates, kernels = upsample_rates_for_hop(hop)
        assert prod(rates) == hop, hop
        assert all(k == 2 * r for r, k in zip(rates, kernels)) or hop in (512, 256, 2048, 640)


def test_infer_cli_restores_overridden_config(wav_dir, tmp_path):
    """r4: a model trained with dotted task overrides (widths the preset
    cannot express) must infer correctly — cli/infer.py overlays the
    workdir's config.json onto the preset template."""
    import dataclasses

    import vocoder_tpu.cli.infer as infer_cli
    from vocoder_tpu.train.trainer import train

    workdir = tmp_path / "run"
    cfg = _train_cfg(wav_dir, workdir, max_steps=1)
    # halve the generator width — infer with the stock preset would fail to
    # restore (param-tree shape mismatch) without the config.json overlay
    cfg = dataclasses.replace(
        cfg, task=cfg.task.replace(
            generator=dataclasses.replace(cfg.task.generator, upsample_initial_channel=8)
        )
    )
    train(cfg)

    tiny = _train_cfg(wav_dir, tmp_path / "unused", max_steps=1).task  # UNMODIFIED preset
    orig = infer_cli.build_task_config
    infer_cli.build_task_config = lambda *a, **k: tiny
    try:
        out_dir = tmp_path / "out"
        infer_cli.main(
            [
                "--model", "hifigan",
                "--ckpt", str(workdir / "checkpoints"),
                "--input", str(wav_dir / "c0.wav"),
                "--output", str(out_dir),
            ]
        )
        assert (out_dir / "c0.wav").exists()
    finally:
        infer_cli.build_task_config = orig
