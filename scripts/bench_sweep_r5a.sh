#!/bin/bash
# Round-5 sweep phase A: BigVGAN TRAIN-step attribution (VERDICT r4 #3).
# The inference side got the full xplane treatment in r4f; this gives the
# 138.2 ms poly-sin train step the same — per-op device-time breakdown of
# the split G/D phases at the shipped b8 point, plus HiFiGAN at the same
# batch as the 2x-MFU-gap comparator.
LOG=${1:-/root/repo/bench_sweep_r5a.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run profile_bigvgan_train python scripts/profile_infer.py \
  --model bigvgan --batch 8 --train --iters 3 --top 40
run profile_hifigan_train python scripts/profile_infer.py \
  --model hifigan --batch 8 --train --iters 3 --top 25
echo "=== SWEEP R5A DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
