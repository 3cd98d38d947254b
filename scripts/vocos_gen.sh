#!/usr/bin/env bash
# Analogue of scripts/vocos_gen.py (baseline-generation helper): synthesise a
# directory with the Vocos model for comparison against another system.
# Usage: vocos_gen.sh CKPT INPUT_DIR OUTPUT_DIR
python -m vocoder_tpu.cli.infer --model vocos --resolution 44100_512_2048 \
    --ckpt "$1" --input "$2" --output "$3" "${@:4}"
