#!/bin/bash
# Round-5 sweep phase F: close the BigVGAN book at the new tile-4096 default
# — b64 and b1 at the default, plus the train-lever winner (filled in from
# r5d) at b8 and b16 for the MFU table.
LOG=${1:-/root/repo/bench_sweep_r5f.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run infer_bigvgan_t4096_b64 python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 64
run infer_bigvgan_t4096_b1  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 1
run bench_default python bench.py
echo "=== SWEEP R5F DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
