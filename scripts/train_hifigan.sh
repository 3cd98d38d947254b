#!/usr/bin/env bash
python -m vocoder_tpu.cli.train --model hifigan --resolution 44100_512_2048 \
    run.workdir=logs/hifigan "$@"
