#!/bin/bash
# Resume runner for the r4h long-horizon soaks (the original run was cut at
# HiFiGAN step ~7000 by an environment restart; Orbax auto-resume picks it
# back up from the step-5000 checkpoint) followed by the r4k batch-point /
# latency / quality-at-horizon sweep.  Same corpus, same arms, same summary.
LOG=${1:-/root/repo/bench_sweep_r4h.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

echo "=== RESUME after environment restart $(date -u +%H:%M:%S) ===" >> "$LOG"

run soak10k_hifigan_resumed python -m vocoder_tpu.cli.train --model hifigan \
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
    ranges = "".join(
        f" {n} range [{min(v):.3f},{max(v):.3f}]" for n, v in (("d", d), ("g", g)) if v
    )
    print(f"--- {arm}: {len(rows)} rows, {len(nan)} non-finite rows;{ranges}")
    for r in rows:
        if "val/metrics/mel" in r:
            print(f"  step {r.get('step','?'):>6}  val mel-L1 {r['val/metrics/mel']:.4f}")
EOF
echo "=== SWEEP DONE $(date -u +%H:%M:%S) ===" >> "$LOG"

# Phase K follows on the same chip once the soaks finish.
bash /root/repo/scripts/bench_sweep_r4k.sh /root/repo/bench_sweep_r4k.log
