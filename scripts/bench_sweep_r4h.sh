#!/bin/bash
# Round-4 sweep phase H: LONG-horizon training soaks.  The r4a soak qualified
# the loss-path knob at 2,000 steps; this phase extends GAN-health evidence to
# 10,000 steps on HiFiGAN (default full-fidelity loss path) and 5,000 steps on
# BigVGAN with the r4 poly-sin snake default — D/G balance, NaN-freedom and
# val-mel trajectory at a horizon 5x the previous record, plus a mid-run
# resume check on each arm.
LOG=${1:-/root/repo/bench_sweep_r4h.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

# Same synthetic corpus recipe as r4a (harmonic stacks + vibrato + AM + noise
# floor) so curves are comparable across rounds.
python - <<'EOF'
import numpy as np, wave, pathlib
root = pathlib.Path("/tmp/soak_clips"); root.mkdir(exist_ok=True)
if len(list(root.glob("*.wav"))) == 64:
    print("corpus already present"); raise SystemExit
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
    noise = np.convolve(noise, np.ones(8) / 8, mode="same")
    sig = sig * env + 0.02 * noise
    sig = (sig / np.abs(sig).max() * 0.7 * rng.uniform(0.6, 1.0)).astype(np.float32)
    with wave.open(str(root / f"clip{i:02d}.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
print("corpus ready:", len(list(root.glob('*.wav'))))
EOF

run soak10k_hifigan python -m vocoder_tpu.cli.train --model hifigan \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=10000 run.val_interval=1000 \
  run.log_interval=100 run.ckpt_interval=2500 run.val_pesq=False \
  run.split_step=true run.workdir=/tmp/soak10k_hifigan

run soak5k_bigvgan python -m vocoder_tpu.cli.train --model bigvgan \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=5000 run.val_interval=1000 \
  run.log_interval=100 run.ckpt_interval=2500 run.val_pesq=False \
  run.split_step=true run.workdir=/tmp/soak5k_bigvgan

# Mid-run restorability: resume each from its last checkpoint for 200 steps.
run soak10k_hifigan_resume python -m vocoder_tpu.cli.train --model hifigan \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=10200 run.val_interval=200 run.log_interval=100 \
  run.ckpt_interval=2500 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/soak10k_hifigan

run soak5k_bigvgan_resume python -m vocoder_tpu.cli.train --model bigvgan \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=5200 run.val_interval=200 run.log_interval=100 \
  run.ckpt_interval=2500 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/soak5k_bigvgan

# Summary: NaN audit + val-mel trajectory + D/G loss ranges.
python - <<'EOF' >> "$LOG" 2>&1
import json, math, pathlib
for arm in ("soak10k_hifigan", "soak5k_bigvgan"):
    p = pathlib.Path(f"/tmp/{arm}/metrics.jsonl")
    rows = [json.loads(l) for l in p.open()] if p.exists() else []
    nan = [r for r in rows if any(isinstance(v, float) and not math.isfinite(v) for v in r.values())]
    d = [r["train/discriminator/all"] for r in rows if "train/discriminator/all" in r]
    g = [r["train/generator/all"] for r in rows if "train/generator/all" in r]
    print(f"--- {arm}: {len(rows)} rows, {len(nan)} non-finite rows; "
          f"d range [{min(d):.3f},{max(d):.3f}] g range [{min(g):.3f},{max(g):.3f}]"
          if d else f"--- {arm}: {len(rows)} rows, {len(nan)} non-finite rows")
    for r in rows:
        if "val/metrics/mel" in r:
            print(f"  step {r.get('step','?'):>6}  val mel-L1 {r['val/metrics/mel']:.4f}")
EOF
echo "=== SWEEP DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
