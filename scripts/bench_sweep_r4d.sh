#!/bin/bash
# Round-4 sweep phase D: Vocos train MFU levers (VERDICT r3 #3) — loss-path
# relaxation (now horizon-qualified by the r4a soak) and the batch knee.
LOG=${1:-/root/repo/bench_sweep_r4d.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run train_vocos_b8_relaxed python -m vocoder_tpu.cli.bench_train --model vocos --loss-stft-dtype bfloat16
run train_vocos_b16 python -m vocoder_tpu.cli.bench_train --model vocos --batch 16 --memory-stats
run train_vocos_b16_relaxed python -m vocoder_tpu.cli.bench_train --model vocos --batch 16 --loss-stft-dtype bfloat16
run train_vocos_b32 python -m vocoder_tpu.cli.bench_train --model vocos --batch 32 --memory-stats

echo "=== SWEEP R4D DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
