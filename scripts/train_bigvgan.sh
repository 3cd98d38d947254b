#!/usr/bin/env bash
# Analogue of scripts/train_convnext_bigvgan_base.sh intent (drift D2: the
# reference's generator config never shipped) — trains the BigVGAN family.
python -m vocoder_tpu.cli.train --model bigvgan --resolution 44100_512_2048 \
    run.workdir=logs/bigvgan "$@"
