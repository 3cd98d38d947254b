"""Checkpoint conversion CLI: reference torch .ckpt -> Orbax generator params.

Migration path for users of the reference framework: converts a Lightning
checkpoint's generator weights (with or without weight-norm parametrizations)
into this framework's parameter layout, optionally folding weight norm for
inference, and writes an Orbax checkpoint directory loadable by the infer CLI.

    python -m vocoder_tpu.cli.convert_ckpt --model hifigan \
        --resolution 44100_512_2048 --src last.ckpt --dst converted/ [--fold]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from vocoder_tpu.config import build_task_config


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hifigan")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument("--src", required=True, help="torch .ckpt/.pt/.pth file")
    ap.add_argument("--dst", required=True, help="output Orbax directory")
    ap.add_argument("--prefix", default="generator.", help="state_dict key prefix")
    ap.add_argument("--fold", action="store_true", help="fold weight norm (inference)")
    args = ap.parse_args(argv)

    import torch

    import orbax.checkpoint as ocp

    from vocoder_tpu import nn
    from vocoder_tpu.models.registry import get_generator

    task = build_task_config(args.model, args.resolution)
    gen = get_generator(task.generator_name)
    assert gen.from_torch is not None, f"no converter for {task.generator_name}"

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    params = gen.from_torch(sd, task.generator, prefix=args.prefix)
    if args.fold:
        params = nn.fold_weight_norm(params)

    dst = Path(args.dst).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(dst / "generator_params", params)
    print(f"wrote {dst / 'generator_params'} ({nn.param_count(params):,} params, fold={args.fold})")


if __name__ == "__main__":
    main()
