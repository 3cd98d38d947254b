"""Neural codec CLI: audio <-> discrete codes through a VQ-VAE checkpoint.

The CLI surface for the UnifyGenerator encode/decode API (unify.py:35-53 —
which the reference exposes only as Python methods):

    python -m vocoder_tpu.cli.codec encode --ckpt run/checkpoints \
        --resolution 44100_512_2048 --input wavs/ --output codes/
    python -m vocoder_tpu.cli.codec decode --ckpt run/checkpoints \
        --resolution 44100_512_2048 --input codes/ --output wavs_out/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from vocoder_tpu.config import build_task_config


def _load(ckpt_path, task):
    import jax

    from vocoder_tpu.train import gan
    from vocoder_tpu.utils.checkpoint import CheckpointManager, abstract_like

    mgr = CheckpointManager(Path(ckpt_path))
    state = gan.create_train_state(jax.random.key(0), task)
    state = mgr.restore(abstract_like(state))
    return state.gen_params, state.extra["vq"]


def main(argv=None):
    ap = argparse.ArgumentParser(description="VQ-VAE / SSL-semantic audio codec")
    ap.add_argument("mode", choices=["encode", "decode"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument(
        "--family",
        default="vqvae",
        choices=["vqvae", "ssl"],
        help="vqvae = spectrogram codec; ssl = HuBERT semantic codec (hifigan-vae)",
    )
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from vocoder_tpu.data.audio_io import AUDIO_EXTENSIONS, read_audio, write_wav
    from vocoder_tpu.data.resample import resample
    from vocoder_tpu.models.vae import (
        decode_from_codes,
        encode_to_codes,
        ssl_decode_from_codes,
        ssl_encode_to_codes,
    )
    from vocoder_tpu.ops import linear_spectrogram

    task = build_task_config(family=args.family, resolution=args.resolution)
    params, vq_state = _load(args.ckpt, task)
    extractor = None
    if args.family == "ssl" and args.mode == "encode":
        from vocoder_tpu.models.ssl_encoders import HubertFeatureExtractor

        extractor = HubertFeatureExtractor(task.generator.hubert)
    if args.family == "ssl":
        encode_to_codes = lambda p, v, feats, g: ssl_encode_to_codes(p, v, feats, g)  # noqa: F811
        decode_from_codes = lambda p, v, codes, g: ssl_decode_from_codes(p, v, codes, g)  # noqa: F811

    in_root = Path(args.input)
    out_root = Path(args.output)
    files = [in_root] if in_root.is_file() else sorted(in_root.rglob("*"))
    for f in files:
        if args.mode == "encode":
            if f.suffix.lower() not in AUDIO_EXTENSIONS:
                continue
            audio, sr = read_audio(f)
            audio = resample(audio.mean(0), sr, task.sampling_rate)
            audio = np.pad(audio, (0, (-len(audio)) % task.hop_length))
            if extractor is not None:  # ssl: host backbone features, not a spectrogram
                spec = jnp.asarray(extractor(audio[None]))
            else:
                spec = linear_spectrogram(
                    jnp.asarray(audio[None]), n_fft=task.n_fft, hop_length=task.hop_length, win_length=task.win_length
                )
            codes = np.asarray(encode_to_codes(params, vq_state, spec, task.generator))
            out = out_root / f.relative_to(in_root if in_root.is_dir() else in_root.parent).with_suffix(".codes.npy")
            out.parent.mkdir(parents=True, exist_ok=True)
            np.save(out, codes.astype(np.int32))
            print(f"{f.name}: {codes.shape} codes -> {out}")
        else:
            if not f.name.endswith(".codes.npy"):
                continue
            codes = jnp.asarray(np.load(f))
            audio = np.asarray(decode_from_codes(params, vq_state, codes, task.generator))
            out = out_root / f.relative_to(in_root if in_root.is_dir() else in_root.parent).name.replace(
                ".codes.npy", ".wav"
            )
            out_root.mkdir(parents=True, exist_ok=True)
            write_wav(out, audio[:, 0, :], task.sampling_rate)
            print(f"{f.name}: -> {out}")


if __name__ == "__main__":
    main()
