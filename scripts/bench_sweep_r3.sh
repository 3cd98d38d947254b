#!/bin/bash
# Round-3 measurement sweep: every queued BENCH.md number + new-backend A/Bs.
# Sequential (one process owns the chip); each step under timeout; results
# appended to the log with markers so BENCH.md rows can be updated from it.
LOG=${1:-/root/repo/bench_sweep_r3.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2100 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run bench_py python bench.py
run train_hifigan_default python -m vocoder_tpu.cli.bench_train --model hifigan
run train_bigvgan_default python -m vocoder_tpu.cli.bench_train --model bigvgan
run infer_bigvgan_b16 python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run infer_bigvgan_b16_pallas env VOCODER_AA_FOLDED_BACKEND=pallas python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
run train_vocos_default python -m vocoder_tpu.cli.bench_train --model vocos
run train_hifigan_spechigh python -m vocoder_tpu.cli.bench_train --model hifigan --spectral-precision high
run train_hifigan_b16 python -m vocoder_tpu.cli.bench_train --model hifigan --batch 16
run train_hifigan_lossbf16 python -m vocoder_tpu.cli.bench_train --model hifigan --loss-stft-dtype bfloat16
run infer_hifigan_b128 python -m vocoder_tpu.cli.bench_infer --model hifigan --batch 128
run train_hifigan_mpd_image env VOCODER_MPD_BACKEND=image python -m vocoder_tpu.cli.bench_train --model hifigan
run train_hifigan_mpd_folded env VOCODER_MPD_BACKEND=folded python -m vocoder_tpu.cli.bench_train --model hifigan
run infer_vocos_huge_b4 python -m vocoder_tpu.cli.bench_infer --model vocos_huge --batch 4
run train_bigvgan_pallas env VOCODER_AA_FOLDED_BACKEND=pallas python -m vocoder_tpu.cli.bench_train --model bigvgan
run infer_vocos_b64 python -m vocoder_tpu.cli.bench_infer --model vocos --batch 64
echo "=== SWEEP DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
