#!/usr/bin/env bash
# Analogue of scripts/train_convnext_hifigan_base.sh (firefly-gan-base).
python -m vocoder_tpu.cli.train --model firefly_gan_base --resolution 44100_512_2048 \
    run.workdir=logs/firefly "$@"
