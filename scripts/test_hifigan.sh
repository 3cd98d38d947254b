#!/usr/bin/env bash
# Analogue of scripts/test_hifigan.sh: CKPT INPUT OUTPUT [extra args]
python -m vocoder_tpu.cli.infer --model hifigan --resolution 44100_512_2048 \
    --ckpt "$1" --input "$2" --output "$3" "${@:4}"
