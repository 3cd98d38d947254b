#!/bin/bash
# Round-5 sweep phase D: BigVGAN train-step levers from the r5a attribution
# (133 ms/step device = 49.5 generator stages + 27.5 weight grads + 19.8
# snake-param grad reductions + 11.4 MPD + 9.8 fp32 STFT loss + rest).
# The 25% MFU bar needs <=119 ms: A/B the two cheap levers and their sum.
LOG=${1:-/root/repo/bench_sweep_r5d.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run train_bigvgan_b8_base python -m vocoder_tpu.cli.bench_train --model bigvgan --batch 8 --iters 10
run train_bigvgan_b8_bf16loss python -m vocoder_tpu.cli.bench_train --model bigvgan --batch 8 \
  --loss-stft-dtype bfloat16 --iters 10
run train_bigvgan_b8_remat python -m vocoder_tpu.cli.bench_train --model bigvgan --batch 8 \
  --gen-checkpointing --iters 10
run train_bigvgan_b8_both python -m vocoder_tpu.cli.bench_train --model bigvgan --batch 8 \
  --loss-stft-dtype bfloat16 --gen-checkpointing --iters 10
echo "=== SWEEP R5D DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
