#!/usr/bin/env bash
# Analogue of reference scripts/train_vocos_huge.sh (batch 4; shard the model
# across chips with run.model_parallel=N when one chip's HBM is exceeded).
python -m vocoder_tpu.cli.train --model vocos_huge --resolution 44100_512_2048 \
    data.batch_size=4 run.workdir=logs/vocos_huge "$@"
