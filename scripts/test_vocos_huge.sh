#!/usr/bin/env bash
python -m vocoder_tpu.cli.infer --model vocos_huge --resolution 44100_512_2048 \
    --ckpt "$1" --input "$2" --output "$3" "${@:4}"
