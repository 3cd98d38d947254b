#!/bin/bash
# Round-4 sweep phase B (VERDICT r3 #1, #3, #6):
#  - BigVGAN whole-AMP-stage fused Pallas kernel A/B (inference, the headline)
#  - HiFiGAN train batch-scaling knee: b32 / b64
#  - Vocos train profile (xplane op breakdown, drives #3)
LOG=${1:-/root/repo/bench_sweep_r4b.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3000 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

# 1. BigVGAN inference A/B: fused AMP-stage kernel vs r3 default (poly4/XLA).
run infer_bigvgan_xla   env VOCODER_AMP_BACKEND=xla   python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_fused env VOCODER_AMP_BACKEND=fused python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
# batch 64: is the fused kernel's advantage batch-stable?
run infer_bigvgan_fused_b64 env VOCODER_AMP_BACKEND=fused python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 64

# 2. HiFiGAN batch knee (b8=81.1ms b16=143.9ms known; where does MFU saturate?)
run train_hifigan_b32 python -m vocoder_tpu.cli.bench_train --model hifigan --batch 32 --memory-stats
run train_hifigan_b64 python -m vocoder_tpu.cli.bench_train --model hifigan --batch 64 --memory-stats

# 3. Vocos train profile: where do the 72% non-MXU ms go?
run profile_vocos_train python scripts/profile_infer.py --model vocos --batch 8 --train --top 40 --out /tmp/prof_vocos_train

echo "=== SWEEP R4B DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
