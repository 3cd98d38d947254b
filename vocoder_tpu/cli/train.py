"""Training CLI.

The analogue of fish_vocoder/train.py + scripts/train_*.sh:

    python -m vocoder_tpu.cli.train --model vocos --resolution 44100_512_2048 \
        data.train_roots="('/data/hifi',)" data.train_probs="(1.0,)" \
        data.val_root=/data/valid run.workdir=logs/vocos

Any dotted override of the TrainConfig tree is accepted after the flags.
"""

from __future__ import annotations

import argparse

from vocoder_tpu.config import build_train_config
from vocoder_tpu.train.trainer import train


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train a TPU-native vocoder")
    ap.add_argument("--model", default="hifigan", help="generator preset (hifigan|vocos|vocos_huge|bigvgan|firefly_gan_base)")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument(
        "--family",
        default="gan",
        choices=["gan", "vae", "vqvae", "ssl"],
        help="task family; ssl = frozen HuBERT -> VQ -> HiFiGAN semantic codec (hifigan-vae.yaml)",
    )
    ap.add_argument("overrides", nargs="*", help="dotted config overrides key=value")
    args = ap.parse_args(argv)

    cfg = build_train_config(args.model, args.resolution, args.family, args.overrides)
    train(cfg)


if __name__ == "__main__":
    main()
