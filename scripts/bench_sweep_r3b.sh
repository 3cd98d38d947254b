#!/bin/bash
# Round-3 sweep phase 2: vocos-huge train attempt + HBM accounting (VERDICT
# r2 next-round #7) and the bf16 loss-STFT 60-step loss-curve A/B (#6).
LOG=${1:-/root/repo/bench_sweep_r3b.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

# North-star single-chip anchor: what TP must beat (may OOM -> that's the result).
run train_vocos_huge_b4 python -m vocoder_tpu.cli.bench_train --model vocos_huge --batch 4 --memory-stats
run infer_hifigan_b16 python -m vocoder_tpu.cli.bench_infer --model hifigan --batch 16
# Do the loss-path relaxations stack? (bf16 loss STFT 71.5 ms, spectral high 75.5 ms, base 81.1)
run train_hifigan_relaxed python -m vocoder_tpu.cli.bench_train --model hifigan --spectral-precision high --loss-stft-dtype bfloat16
run train_bigvgan_relaxed python -m vocoder_tpu.cli.bench_train --model bigvgan --spectral-precision high --loss-stft-dtype bfloat16

# 60-step loss-curve A/B on synthetic clips: fp32 vs bf16 loss-STFT.
python - <<'EOF'
import numpy as np, wave, pathlib
root = pathlib.Path("/tmp/smoke_clips"); root.mkdir(exist_ok=True)
rng = np.random.default_rng(0)
for i in range(24):
    t = np.arange(int(44100 * 1.8)) / 44100.0
    f0 = rng.uniform(80, 400)
    sig = sum(np.sin(2*np.pi*f0*k*t + rng.uniform(0, 6.28)) / k for k in range(1, 6))
    sig = (sig / np.abs(sig).max() * 0.7 * rng.uniform(0.5, 1.0)).astype(np.float32)
    with wave.open(str(root / f"clip{i:02d}.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(44100)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
EOF
run smoke_fp32loss python -m vocoder_tpu.cli.train --model hifigan \
  "data.train_roots=('/tmp/smoke_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/smoke_clips \
  data.batch_size=8 run.max_steps=60 run.val_interval=50 run.log_interval=10 \
  run.ckpt_interval=1000 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/smoke_fp32loss
run smoke_bf16loss python -m vocoder_tpu.cli.train --model hifigan \
  task.loss_stft_dtype=bfloat16 \
  "data.train_roots=('/tmp/smoke_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/smoke_clips \
  data.batch_size=8 run.max_steps=60 run.val_interval=50 run.log_interval=10 \
  run.ckpt_interval=1000 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/smoke_bf16loss
echo "=== SWEEP2 DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
