#!/bin/bash
# Round-4 sweep phase G: fused kernel extended to the wide C=256 first stage
# (per-block kernels) — does it cross 450 audio-s/s?
LOG=${1:-/root/repo/bench_sweep_r4g.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}
run infer_bigvgan_fused256 env VOCODER_AMP_BACKEND=fused python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run bench_py python bench.py
echo "=== SWEEP R4G DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
