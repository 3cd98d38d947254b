"""Inference CLI: mel/audio -> waveform.

The analogue of fish_vocoder/test.py:27-100: load a checkpoint (this
framework's Orbax checkpoints OR a reference torch .ckpt via the converter —
drop-in migration), fold weight norm, then for each input file (.wav audio,
or precomputed .npy/.pt mel) synthesise and write a wav.

    python -m vocoder_tpu.cli.infer --model hifigan --resolution 44100_512_2048 \
        --ckpt logs/train/checkpoints --input in_dir --output out_dir
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vocoder_tpu import nn
from vocoder_tpu.config import build_task_config
from vocoder_tpu.data.audio_io import AUDIO_EXTENSIONS, read_audio, write_wav
from vocoder_tpu.data.resample import resample
from vocoder_tpu.models.registry import get_generator
from vocoder_tpu.train import gan
from vocoder_tpu.utils.logging import log


def load_generator_params(ckpt_path: str, task_cfg, fold: bool = True):
    """Load generator params from Orbax (dir) or a torch checkpoint (file)."""
    path = Path(ckpt_path)
    gen = get_generator(task_cfg.generator_name)
    if path.is_file() and path.suffix in (".ckpt", ".pt", ".pth", ".bin"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        assert gen.from_torch is not None, f"no torch converter for {task_cfg.generator_name}"
        params = gen.from_torch(sd, task_cfg.generator, prefix="generator.")
    elif (path / "generator_params").exists():
        # Params-only export from cli/convert_ckpt.py.
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(path.absolute() / "generator_params")
    else:
        from vocoder_tpu.utils.checkpoint import CheckpointManager, abstract_like

        mgr = CheckpointManager(path)
        state = gan.create_train_state(jax.random.key(0), task_cfg)
        state = mgr.restore(abstract_like(state))
        params = state.gen_params
    if fold:
        params = nn.fold_weight_norm(params)
    return params


def _load_mel_item(f, args, task, featurize):
    """Load one input file -> (mel (C, num_mels, F) float32, true_samples).

    Shared by the per-file and batched paths so their preprocessing (npy/pt
    auto-transpose, pitch shift, hop padding, featurise) cannot drift apart.
    For audio inputs also returns the resampled audio (template builders need
    it); None for precomputed mels.
    """
    suffix = f.suffix.lower()
    if suffix in (".npy", ".pt", ".pth"):
        if suffix == ".npy":
            mel = np.load(f)
        else:
            import torch

            mel = torch.load(f, map_location="cpu").float().numpy()
        if mel.ndim == 2:
            mel = mel[None]
        if mel.shape[-1] == task.num_mels:  # auto-transpose (test.py:82-84)
            mel = mel.transpose(0, 2, 1)
        mel = np.asarray(mel, np.float32)
        return mel, mel.shape[2] * task.hop_length, None
    audio, sr = read_audio(f)
    audio = resample(audio, sr, task.sampling_rate)
    if args.pitch_shift:
        ratio = 2 ** (args.pitch_shift / 12)
        step = round(task.sampling_rate * ratio)
        audio = resample(audio, step - step % 100, task.sampling_rate)
    t = audio.shape[-1]
    pad = (-t) % task.hop_length
    audio = np.pad(audio, ((0, 0), (0, pad)))
    mel = np.asarray(featurize(jnp.asarray(audio)))  # (C, num_mels, F)
    return mel, audio.shape[-1], audio


def _batched_audio_synthesis(files, args, task, featurize, synth_masked, params, out_root, in_root, min_frames):
    """Length-sorted exact batched synthesis (frame_lengths masking).

    Files are decoded and featurised on the host, sorted by frame count,
    grouped `--batch` at a time, zero-padded (lens=0 dummy rows fill the
    ragged last group so every call reuses one compiled shape per 64-frame
    bucket), and synthesised in one device call per group; per-layer masking
    makes every row equal its unbatched forward.  Multi-channel files
    contribute one item per channel.  Returns the files DEFERRED to the
    per-file path: longer than the --chunk-frames streaming budget, or
    shorter than the model's masked-edge minimum (BigVGAN's dynamic edge
    splice needs >= 32 samples at its first stage).
    """
    items = []  # (file_index, channel, mel (num_mels, F))
    metas = {}  # file_index -> (path, n_channels, frames, true_samples, outputs)
    deferred = []
    for fi, f in enumerate(files):
        mel, true_t, _audio = _load_mel_item(f, args, task, featurize)
        frames = mel.shape[2]
        if (args.chunk_frames and frames > args.chunk_frames) or frames < min_frames:
            deferred.append(f)
            continue
        metas[fi] = (f, mel.shape[0], frames, true_t, {})
        for c in range(mel.shape[0]):
            items.append((fi, c, mel[c]))

    items.sort(key=lambda it: it[2].shape[1])
    start = time.time()
    total_s = 0.0
    for g0 in range(0, len(items), args.batch):
        group = items[g0 : g0 + args.batch]
        fmax = -(-max(it[2].shape[1] for it in group) // 64) * 64
        mel_b = np.zeros((args.batch, task.num_mels, fmax), np.float32)
        lens = np.zeros(args.batch, np.int32)  # dummy rows keep lens 0
        for j, (_, _, m) in enumerate(group):
            mel_b[j, :, : m.shape[1]] = m
            lens[j] = m.shape[1]
        out = np.asarray(synth_masked(params, jnp.asarray(mel_b), jnp.asarray(lens)))
        for j, (fi, c, m) in enumerate(group):
            metas[fi][4][c] = out[j, 0, : m.shape[1] * task.hop_length]
            total_s += m.shape[1] * task.hop_length / task.sampling_rate

    if items:
        log(f"batched synthesis: {len(items)} items, {total_s:.1f}s audio in {time.time() - start:.2f}s")
    for f, n_ch, _frames, true_t, outs in metas.values():
        fake = np.stack([outs[c] for c in range(n_ch)])[:, :true_t]
        out_path = out_root / f.relative_to(in_root).with_suffix(".wav")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        write_wav(out_path, fake, task.sampling_rate)
        log(f"saved {out_path}")
    return deferred


def main(argv=None):
    ap = argparse.ArgumentParser(description="Vocoder inference")
    ap.add_argument("--model", default="hifigan")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--input", required=True, help="audio/mel file or directory")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--pitch-shift", type=float, default=0.0)
    ap.add_argument(
        "--chunk-frames",
        type=int,
        default=2048,
        help="mel frames per synthesis chunk for long files (0 = single pass); "
        "keeps XLA shapes static and HBM bounded (SURVEY.md §5.7)",
    )
    ap.add_argument(
        "--batch",
        type=int,
        default=1,
        help="synthesise N files per device call (length-sorted, padded to a "
        "64-frame bucket, EXACT via per-layer length masking; hifigan/vocos/bigvgan)",
    )
    ap.add_argument(
        "--model-parallel",
        type=int,
        default=1,
        help="shard the generator over N devices (channel/Megatron tensor "
        "parallelism via the model's param_specs + activation constraints); "
        "for generators too large for one chip's HBM",
    )
    args = ap.parse_args(argv)

    task = build_task_config(args.model, args.resolution)
    # If the checkpoint's training workdir recorded its config (trainer.py
    # writes config.json), overlay it so dotted-override-trained models
    # (e.g. reduced widths) infer with the EXACT trained architecture —
    # the preset alone cannot express those.
    ckpt_dir = Path(args.ckpt)
    for cand in (ckpt_dir / "config.json", ckpt_dir.parent / "config.json"):
        if ckpt_dir.is_dir() and cand.is_file():
            import json

            saved = json.loads(cand.read_text()).get("task", {})
            if saved.get("generator_name", task.generator_name) != task.generator_name:
                raise SystemExit(
                    f"{cand} records generator {saved['generator_name']!r}; pass "
                    f"--model accordingly (got {task.generator_name!r})"
                )
            from vocoder_tpu.config import overlay_task_config

            task = overlay_task_config(task, saved)
            log(f"task config restored from {cand}")
            break
    gen = get_generator(task.generator_name)
    params = load_generator_params(args.ckpt, task)

    if args.model_parallel > 1:
        from vocoder_tpu.parallel import make_mesh
        from vocoder_tpu.parallel.mesh import train_state_specs

        if len(jax.devices()) < args.model_parallel:
            raise SystemExit(
                f"--model-parallel {args.model_parallel} needs that many devices; "
                f"have {len(jax.devices())}"
            )
        mesh = make_mesh(data=1, model=args.model_parallel, devices=jax.devices()[: args.model_parallel])
        gen_specs = gen.param_specs(task.generator) if gen.param_specs is not None else None
        if gen_specs is not None:
            gen_specs = nn.fold_weight_norm_specs(gen_specs)
        params = jax.tree.map(jax.device_put, params, train_state_specs(params, mesh, gen_specs))
        log(f"model-parallel inference: {args.model_parallel}-way tensor sharding on {mesh.shape}")
        # The ambient mesh binds the models' activation sharding constraints
        # at trace time (parallel/mesh.py::constrain), so every jit below
        # compiles as a sharded GSPMD program.
        with mesh:
            return _synthesis_main(args, task, gen, params)
    return _synthesis_main(args, task, gen, params)


def _synthesis_main(args, task, gen, params):
    # Params are ARGUMENTS, not closure constants: giant baked-in weight
    # constants (e.g. vocos-huge's 1.3 GB) can wedge the XLA compiler.
    @jax.jit
    def _synthesize(p, mel, template=None):
        return gen.apply(p, mel, task.generator, template=template)

    def synthesize(mel, template=None):
        return _synthesize(params, mel, template)

    @jax.jit
    def _synthesize_masked(p, mel, frame_lengths):
        return gen.apply(p, mel, task.generator, frame_lengths=frame_lengths)

    @jax.jit
    def featurize(audio):  # (B, T) -> (B, n_mels, frames)
        return gan.input_transform(task, audio)

    input_path = Path(args.input)
    files = [input_path] if input_path.is_file() else sorted(input_path.rglob("*"))
    out_root = Path(args.output)
    in_root = input_path.parent if input_path.is_file() else input_path

    # Masked batching requires: a generator with frame_lengths support, no
    # template, and even (kernel - stride) on every upsample stage (an odd
    # stage creeps the output length by one sample per item, which the shared
    # lens bookkeeping cannot represent — fall back rather than be subtly
    # inexact).
    batchable = args.batch > 1 and task.generator_name in ("hifigan", "vocos", "bigvgan") and not gan.needs_template(task)
    up_rates = getattr(task.generator, "upsample_rates", ())
    up_kernels = getattr(task.generator, "upsample_kernel_sizes", ())
    if batchable and any((k - u) % 2 for u, k in zip(up_rates, up_kernels)):
        batchable = False
    if args.batch > 1 and not batchable:
        log(f"--batch: falling back to per-file synthesis for {task.generator_name}")
    if batchable:
        batch_suffixes = AUDIO_EXTENSIONS | {".npy", ".pt", ".pth"}
        # BigVGAN's masked aa-snake re-splices each item's edge from a
        # 32-sample window at its first resblock stage (rate[0] samples per
        # frame); shorter clips go through the per-file path.
        min_frames = -(-32 // max(up_rates[0], 1)) if task.generator_name == "bigvgan" else 1
        batch_files = [f for f in files if f.suffix.lower() in batch_suffixes]
        deferred = _batched_audio_synthesis(
            batch_files, args, task, featurize, _synthesize_masked, params, out_root, in_root, min_frames
        )
        batched = set(batch_files) - set(deferred)
        files = [f for f in files if f not in batched]

    for f in files:
        suffix = f.suffix.lower()
        if suffix not in AUDIO_EXTENSIONS and suffix not in (".npy", ".pt", ".pth"):
            continue
        # Multi-channel audio runs as a batch, one channel per item
        # (test.py:56-60 semantics), and writes back multi-channel.
        mel_np, _true_t, audio = _load_mel_item(f, args, task, featurize)
        mel = jnp.asarray(mel_np)
        template = None
        if gan.needs_template(task):
            if audio is None:
                raise SystemExit(
                    f"{task.generator_name} needs an f0 template derived from source "
                    "audio; precomputed-mel input has none. Pass audio files instead."
                )
            from vocoder_tpu.data.f0 import estimate_f0, template_from_f0

            template = jnp.asarray(
                np.stack(
                    [
                        template_from_f0(
                            estimate_f0(ch, task.sampling_rate, task.hop_length),
                            task.sampling_rate,
                            task.hop_length,
                        )
                        for ch in audio
                    ]
                )[:, None, :]
            )

        start = time.time()
        if template is None and args.chunk_frames and mel.shape[2] > args.chunk_frames:
            from vocoder_tpu.parallel.streaming import chunked_synthesis

            fake = np.concatenate(
                [
                    np.asarray(
                        chunked_synthesis(
                            synthesize,
                            mel[i : i + 1],
                            hop_length=task.hop_length,
                            chunk_frames=args.chunk_frames,
                            overlap_frames=32,
                        )
                    )
                    for i in range(mel.shape[0])
                ]
            )
        else:
            fake = np.asarray(synthesize(mel, template))  # (B, 1, T)
        dur = fake.shape[-1] / task.sampling_rate
        log(f"{f.name}: {dur:.2f}s audio in {time.time() - start:.2f}s")

        out_path = out_root / f.relative_to(in_root).with_suffix(".wav")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        write_wav(out_path, fake[:, 0, :], task.sampling_rate)
        log(f"saved {out_path}")


if __name__ == "__main__":
    main()
