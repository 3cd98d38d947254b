#!/usr/bin/env bash
# Analogue of scripts/train_vocos_huge_full.sh: vocos-huge at full batch with
# channel sharding across chips (set run.model_parallel to the chips per replica).
python -m vocoder_tpu.cli.train --model vocos_huge --resolution 44100_512_2048 \
    data.batch_size=16 run.model_parallel=4 run.workdir=logs/vocos_huge_full "$@"
