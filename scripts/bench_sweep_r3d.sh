#!/bin/bash
# Round-3 sweep phase 4: shift-FMA depthwise-FIR A/Bs (profile-driven — the
# depthwise convs were flipping the C>=128 stage layouts, 57% of train step).
LOG=${1:-/root/repo/bench_sweep_r3d.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}
# Training: auto backend is poly4 on the unfolded stages -> shift vs conv.
run train_bigvgan_shift python -m vocoder_tpu.cli.bench_train --model bigvgan
# Inference: does poly4+shift on the C>=128 stages beat the pallas kernel?
run infer_bigvgan_poly4_shift env VOCODER_AA_BACKEND=poly4 python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_poly4_conv env VOCODER_AA_BACKEND=poly4 VOCODER_DWCONV=conv python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
echo "=== SWEEP4 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
