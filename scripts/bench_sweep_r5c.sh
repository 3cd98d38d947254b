#!/bin/bash
# Round-5 sweep phase C: quality-at-horizon for the SECOND family.  The r4h
# BigVGAN soak reaches step 5200 in the resume arm (checkpoints at 2500 and
# 5000); synthesize from its step-5000 checkpoint over the soak corpus and
# score generated vs source (mel-L1, native PESQ NB/WB, SI-SDR) — the same
# loop the reference runs via test.py + eval.py (fish_vocoder/eval.py:44-97).
LOG=${1:-/root/repo/bench_sweep_r5c.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

if [ -d /tmp/soak5k_bigvgan/checkpoints/5000 ]; then
  echo "--- quality eval scores the step-5000 BigVGAN checkpoint" >> "$LOG"
  run infer_soak5k_bigvgan python -m vocoder_tpu.cli.infer --model bigvgan \
    --ckpt /tmp/soak5k_bigvgan/checkpoints \
    --input /tmp/soak_clips --output /tmp/soak5k_bigvgan_gen --batch 8
  run eval_soak5k_bigvgan python -m vocoder_tpu.cli.evaluate /tmp/soak_clips /tmp/soak5k_bigvgan_gen \
    --sr 44100 --workers 4
else
  latest=$(ls /tmp/soak5k_bigvgan/checkpoints 2>/dev/null | sort -n | tail -1)
  echo "--- step-5000 BigVGAN checkpoint missing (latest: ${latest:-none}); skipping" >> "$LOG"
fi
echo "=== SWEEP R5C DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
