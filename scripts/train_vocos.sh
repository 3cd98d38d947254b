#!/usr/bin/env bash
# Analogue of reference scripts/train_vocos.sh
python -m vocoder_tpu.cli.train --model vocos --resolution 44100_512_2048 \
    run.workdir=logs/vocos "$@"
