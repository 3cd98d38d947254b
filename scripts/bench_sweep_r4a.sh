#!/bin/bash
# Round-4 sweep phase A: the >=2,000-step training soak + loss-path A/B at
# horizon (VERDICT r3 next-round #2).  One HiFiGAN full-config arm per
# loss-STFT dtype (fp32 vs bfloat16), identical seeds/corpus, then a
# mid-run-checkpoint resume check on each arm.
LOG=${1:-/root/repo/bench_sweep_r4a.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

# Richer synthetic corpus than the 60-step smoke: 64 clips, 2.0 s, harmonic
# stacks with vibrato + AM envelopes + filtered noise floor, so the GAN has
# spectro-temporal structure to learn over thousands of steps.
python - <<'EOF'
import numpy as np, wave, pathlib
root = pathlib.Path("/tmp/soak_clips"); root.mkdir(exist_ok=True)
rng = np.random.default_rng(0)
sr = 44100
for i in range(64):
    t = np.arange(int(sr * 2.0)) / sr
    f0 = rng.uniform(70, 500)
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
    phase = 2 * np.pi * f0 * np.cumsum(vib) / sr
    nharm = int(min(10, 0.45 * sr / f0))
    amps = rng.uniform(0.3, 1.0, nharm) / np.arange(1, nharm + 1)
    sig = sum(a * np.sin(k * phase + rng.uniform(0, 6.28)) for k, a in enumerate(amps, 1))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t + rng.uniform(0, 6.28))
    noise = rng.standard_normal(t.size)
    noise = np.convolve(noise, np.ones(8) / 8, mode="same")  # lowpassed floor
    sig = sig * env + 0.02 * noise
    sig = (sig / np.abs(sig).max() * 0.7 * rng.uniform(0.6, 1.0)).astype(np.float32)
    with wave.open(str(root / f"clip{i:02d}.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
print("corpus ready:", len(list(root.glob('*.wav'))))
EOF

COMMON='data.batch_size=8 run.max_steps=2000 run.val_interval=250
  run.log_interval=50 run.ckpt_interval=500 run.val_pesq=False
  run.split_step=true'

run soak_fp32loss python -m vocoder_tpu.cli.train --model hifigan \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  $COMMON run.workdir=/tmp/soak_fp32loss
run soak_bf16loss python -m vocoder_tpu.cli.train --model hifigan \
  task.loss_stft_dtype=bfloat16 \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  $COMMON run.workdir=/tmp/soak_bf16loss

# Mid-run restorability: auto-resume each arm from its latest checkpoint
# (step 2000) and run 100 more steps, including one val.
run soak_fp32_resume python -m vocoder_tpu.cli.train --model hifigan \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=2100 run.val_interval=100 run.log_interval=50 \
  run.ckpt_interval=500 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/soak_fp32loss
run soak_bf16_resume python -m vocoder_tpu.cli.train --model hifigan \
  task.loss_stft_dtype=bfloat16 \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=2100 run.val_interval=100 run.log_interval=50 \
  run.ckpt_interval=500 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/soak_bf16loss

# Summarize both metrics.jsonl streams: NaN audit + loss trajectory table.
python - <<'EOF' >> "$LOG" 2>&1
import json, math, pathlib
for arm in ("soak_fp32loss", "soak_bf16loss"):
    p = pathlib.Path(f"/tmp/{arm}/metrics.jsonl")
    rows = [json.loads(l) for l in p.open()] if p.exists() else []
    nan = [r for r in rows if any(isinstance(v, float) and not math.isfinite(v) for v in r.values())]
    print(f"--- {arm}: {len(rows)} rows, {len(nan)} non-finite rows")
    for r in rows:
        if r.get("step", 0) % 500 == 0 or "val/metrics/mel" in r:
            keep = {k: round(v, 4) if isinstance(v, float) else v for k, v in r.items()
                    if k in ("step", "train/generator/all", "train/discriminator/all",
                             "train/generator/mel", "val/metrics/mel", "val/metrics/pesq")}
            if len(keep) > 1:
                print(json.dumps(keep))
EOF
echo "=== SWEEP R4A DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
