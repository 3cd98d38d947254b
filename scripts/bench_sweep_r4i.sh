#!/bin/bash
# Round-4 sweep phase I:
#  - fused AMP kernel tile-size A/B: 1024-row tiles pay 19%/11% halo
#    recompute at f=1/f=2 (halos 96/56 rows per side); 2048 halves it
#  - BigVGAN train batch knee (b16 vs the shipped b8, poly-sin default)
#  - bench.py confirmation under the driver's own invocation
LOG=${1:-/root/repo/bench_sweep_r4i.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run infer_bigvgan_tile1024 env VOCODER_AMP_TILE=1024 \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_tile2048 env VOCODER_AMP_TILE=2048 \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16

# FIR lowering A/B: v1 shuffle FIRs lost pre-poly-sin (253.6 vs 218.1 ms)
# when the VPU was sin-saturated; with poly-sin the roofline says the mm
# form pays ~41 ms of structural-zero MXU matmuls the shuffle form avoids.
run infer_bigvgan_fir_shuffle env VOCODER_AMP_FIR=shuffle \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_fir_shuffle_t2048 env VOCODER_AMP_FIR=shuffle VOCODER_AMP_TILE=2048 \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16

# Mixed per-stage lowering (README roadmap / VERDICT r4 #3): shuffle on the
# MXU-heaviest folded stages, mm elsewhere (folds present: 1, 2, 4, 8).
run infer_bigvgan_fir_mixed2  env VOCODER_AMP_FIR=mm,f2=shuffle \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_fir_mixed24 env VOCODER_AMP_FIR=mm,f2=shuffle,f4=shuffle \
  python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16

# BigVGAN train knee: b16 (HiFiGAN saturated at b16-b32; BigVGAN unmeasured).
run train_bigvgan_b16 python -m vocoder_tpu.cli.bench_train --model bigvgan \
  --batch 16 --iters 10

run bench_default python bench.py
echo "=== SWEEP R4I DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
