#!/usr/bin/env bash
# Analogue of scripts/train_convnext_hifigan_vae.sh (VAE family).
python -m vocoder_tpu.cli.train --family vae --resolution 44100_512_2048 \
    run.workdir=logs/vae "$@"
