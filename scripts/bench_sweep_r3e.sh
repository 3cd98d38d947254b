#!/bin/bash
# Round-3 sweep phase 5: confirm the new bigvgan default on-chip and
# re-profile to find the next lever.
LOG=${1:-/root/repo/bench_sweep_r3e.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}
run infer_bigvgan_default python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run profile_bigvgan_infer2 python scripts/profile_infer.py --model bigvgan --batch 16 --top 30 --out /tmp/prof_bv_inf2
echo "=== SWEEP5 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
