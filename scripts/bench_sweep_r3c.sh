#!/bin/bash
# Round-3 sweep phase 3: op-level profiles of the BigVGAN inference forward
# and train step (the remaining 2x target, VERDICT r2 next-round #2).
LOG=${1:-/root/repo/bench_sweep_r3c.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}
run profile_bigvgan_infer python scripts/profile_infer.py --model bigvgan --batch 16 --top 40 --out /tmp/prof_bv_inf
run profile_bigvgan_train python scripts/profile_infer.py --model bigvgan --batch 8 --train --top 40 --out /tmp/prof_bv_train
echo "=== SWEEP3 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
