#!/bin/bash
# Round-4 sweep phase E: the poly-sin snake backend (VOCODER_SNAKE_SIN) on
# BigVGAN — XLA path and fused kernel, inference + train.
LOG=${1:-/root/repo/bench_sweep_r4e.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

# poly sin is now the default; A/B against exact on both backends
run infer_bigvgan_xla_poly   env VOCODER_AMP_BACKEND=xla   python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_fused_poly env VOCODER_AMP_BACKEND=fused python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run train_bigvgan_poly python -m vocoder_tpu.cli.bench_train --model bigvgan

echo "=== SWEEP R4E DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
