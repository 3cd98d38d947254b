#!/bin/bash
# Round-5 sweep phase E: fused-AMP tile A/B, second attempt.  r4i's mm+2048
# point OOM'd the 16 MiB scoped-vmem default by 384K; the kernel now asks
# for 100 MiB (v5e has 128), so the halo-amortisation curve can actually be
# measured for the default mm lowering (shuffle+2048 already showed -6.8 ms
# over shuffle+1024).
LOG=${1:-/root/repo/bench_sweep_r5e.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run infer_bigvgan_mm_t2048 env VOCODER_AMP_TILE=2048 \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_mm_t4096 env VOCODER_AMP_TILE=4096 \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
# b64 at the winning tile: the large-batch point from r4f (435.4 at t1024).
run infer_bigvgan_mm_t2048_b64 env VOCODER_AMP_TILE=2048 \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 64
echo "=== SWEEP R5E DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
