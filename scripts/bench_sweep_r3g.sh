#!/bin/bash
# Round-3 sweep phase 7: FLOP accounting for the vocos-huge MFU row + a
# vocos-huge batch-16 attempt (HBM says ~9 GB at b4; b16 may fit with remat).
LOG=${1:-/root/repo/bench_sweep_r3g.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}
run train_vocos_huge_flops python -m vocoder_tpu.cli.bench_train --model vocos_huge --batch 4 --memory-stats
run train_vocos_flops python -m vocoder_tpu.cli.bench_train --model vocos --batch 8 --memory-stats
echo "=== SWEEP7 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
