#!/bin/bash
# Round-4 sweep phase C: the REVISED fused AMP-stage kernel (FIRs as folded
# matmuls, both branches in one (L,2L) matmul) vs the XLA folded default,
# plus an xplane profile of the fused inference forward for attribution.
LOG=${1:-/root/repo/bench_sweep_r4c.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run infer_bigvgan_fused_v2 env VOCODER_AMP_BACKEND=fused python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run profile_bigvgan_fused env VOCODER_AMP_BACKEND=fused python scripts/profile_infer.py --model bigvgan --batch 16 --top 40 --out /tmp/prof_bv_fused

echo "=== SWEEP R4C DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
