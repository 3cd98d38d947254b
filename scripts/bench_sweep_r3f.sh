#!/bin/bash
# Round-3 sweep phase 6: dense diagonal-tap FIR A/B (kills the depthwise
# {2,0,1} relayouts; MXU pays the structural zeros).
LOG=${1:-/root/repo/bench_sweep_r3f.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}
run train_bigvgan_dense env VOCODER_DWCONV=dense python -m vocoder_tpu.cli.bench_train --model bigvgan
run infer_bigvgan_dense env VOCODER_DWCONV=dense python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
echo "=== SWEEP6 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
