#!/bin/bash
# Round-4 sweep phase K:
#  - unexplored inference batch points: vocos-huge b8/b16 (BENCH.md has only
#    b4 = 622 audio-s/s for the north-star model), HiFiGAN b256 (past the
#    current b128 flagship row), Vocos b128 (past b64 = 4581)
#  - b1 serving-latency rows: ms to synthesize one 256-frame (~2.97 s at
#    44.1 kHz hop 512) request, per family — real-time serving cares about
#    single-request latency, not just batched throughput
#  - end-to-end QUALITY at horizon: synthesize the r4h 10k-step HiFiGAN
#    checkpoint over the soak corpus and score it (mel-L1, native PESQ,
#    SI-SDR) — the first trained-to-horizon quality number in BENCH.md
LOG=${1:-/root/repo/bench_sweep_r4k.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run infer_vocos_huge_b8  python -m vocoder_tpu.cli.bench_infer --model vocos-huge --batch 8
run infer_vocos_huge_b16 python -m vocoder_tpu.cli.bench_infer --model vocos-huge --batch 16
run infer_hifigan_b256   python -m vocoder_tpu.cli.bench_infer --model hifigan --batch 256
run infer_vocos_b128     python -m vocoder_tpu.cli.bench_infer --model vocos --batch 128

run latency_hifigan_b1   python -m vocoder_tpu.cli.bench_infer --model hifigan --batch 1
run latency_vocos_b1     python -m vocoder_tpu.cli.bench_infer --model vocos --batch 1
run latency_bigvgan_b1   python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 1

# Quality at horizon: infer the 10k-step soak checkpoint over its corpus,
# then evaluate generated vs source (the task the reference's test.py+eval.py
# pipeline performs, fish_vocoder/eval.py:55).
if [ -d /tmp/soak10k_hifigan/checkpoints/10000 ]; then
  echo "--- quality eval scores the step-10000 checkpoint" >> "$LOG"
  run infer_soak10k python -m vocoder_tpu.cli.infer --model hifigan \
    --ckpt /tmp/soak10k_hifigan/checkpoints \
    --input /tmp/soak_clips --output /tmp/soak10k_gen --batch 8
  run eval_soak10k python -m vocoder_tpu.cli.evaluate /tmp/soak_clips /tmp/soak10k_gen \
    --sr 44100 --workers 4
else
  latest=$(ls /tmp/soak10k_hifigan/checkpoints 2>/dev/null | sort -n | tail -1)
  echo "--- step-10000 checkpoint missing (latest: ${latest:-none}); skipping quality eval" >> "$LOG"
fi
echo "=== SWEEP R4K DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
