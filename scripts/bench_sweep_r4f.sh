#!/bin/bash
# Round-4 sweep phase F: poly-sin follow-through —
#  - fused-poly profile (where do the remaining 113.5 ms go?)
#  - batch-64 scaling of the new default
#  - 500-step BigVGAN training soak with poly-sin (loss-curve health)
LOG=${1:-/root/repo/bench_sweep_r4f.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run profile_bigvgan_fused_poly python scripts/profile_infer.py --model bigvgan --batch 16 --top 30 --out /tmp/prof_bv_fp
run infer_bigvgan_poly_b64 python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 64

# 500-step bigvgan soak on the r4a corpus: poly-sin training health.
run soak_bigvgan_poly python -m vocoder_tpu.cli.train --model bigvgan \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=500 run.val_interval=125 run.log_interval=25 \
  run.ckpt_interval=250 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/soak_bigvgan_poly

python - <<'EOF' >> "$LOG" 2>&1
import json, math, pathlib
p = pathlib.Path("/tmp/soak_bigvgan_poly/metrics.jsonl")
rows = [json.loads(l) for l in p.open()] if p.exists() else []
nan = [r for r in rows if any(isinstance(v, float) and not math.isfinite(v) for v in r.values())]
print(f"--- soak_bigvgan_poly: {len(rows)} rows, {len(nan)} non-finite rows")
for r in rows:
    keep = {k: round(v, 4) if isinstance(v, float) else v for k, v in r.items()
            if k in ("step", "train/generator/all", "train/discriminator/all",
                     "train/generator/mel", "val/metrics/mel")}
    if len(keep) > 1 and (r.get("step", 0) % 125 == 0 or "val/metrics/mel" in r):
        print(json.dumps(keep))
EOF
echo "=== SWEEP R4F DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
