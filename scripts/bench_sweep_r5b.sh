#!/bin/bash
# Round-5 sweep phase B: the loss-path A/B taken to the 10k horizon
# (VERDICT r4 next-round #5).  The r4h/r4h_resume 10k HiFiGAN soak
# (/tmp/soak10k_hifigan) already IS the fp32 arm — same corpus, same default
# seed, same batch/schedule as the r4a arms — so only the bf16 arm runs
# fresh; the summary compares val-mel trajectories at each 1k-step point.
# Hierarchical (seed,host,step,slot) data keys make the streams identical
# across arms and across resumes, so the curves are directly comparable.
LOG=${1:-/root/repo/bench_sweep_r5b.log}
cd /root/repo
run() {
  name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  rc=$?
  echo "=== END $name rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG"
}

run soak10k_bf16loss python -m vocoder_tpu.cli.train --model hifigan \
  task.loss_stft_dtype=bfloat16 \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=10000 run.val_interval=1000 \
  run.log_interval=100 run.ckpt_interval=2500 run.val_pesq=False \
  run.split_step=true run.workdir=/tmp/soak10k_bf16loss

# Mid-run restorability on the bf16 arm (r4a methodology): +200 steps.
run soak10k_bf16_resume python -m vocoder_tpu.cli.train --model hifigan \
  task.loss_stft_dtype=bfloat16 \
  "data.train_roots=('/tmp/soak_clips',)" "data.train_probs=(1.0,)" data.val_root=/tmp/soak_clips \
  data.batch_size=8 run.max_steps=10200 run.val_interval=200 run.log_interval=100 \
  run.ckpt_interval=2500 run.val_pesq=False run.split_step=true \
  run.workdir=/tmp/soak10k_bf16loss

# Summary: NaN audit + side-by-side val-mel trajectory (fp32 soak vs bf16 arm).
python - <<'EOF' >> "$LOG" 2>&1
import json, math, pathlib

def load(arm):
    p = pathlib.Path(f"/tmp/{arm}/metrics.jsonl")
    rows = [json.loads(l) for l in p.open()] if p.exists() else []
    nan = sum(1 for r in rows
              if any(isinstance(v, float) and not math.isfinite(v) for v in r.values()))
    val = {}
    for r in rows:
        if "val/metrics/mel" in r:
            val[int(r.get("step", -1))] = r["val/metrics/mel"]  # last write wins (resume overlap)
    print(f"--- {arm}: {len(rows)} rows, {nan} non-finite rows")
    return val

fp32 = load("soak10k_hifigan")
bf16 = load("soak10k_bf16loss")
print(f"{'step':>6} {'fp32':>8} {'bf16':>8} {'delta':>8}")
for s in sorted(set(fp32) & set(bf16)):
    if s % 1000 == 0:
        print(f"{s:>6} {fp32[s]:8.4f} {bf16[s]:8.4f} {bf16[s]-fp32[s]:+8.4f}")
EOF
echo "=== SWEEP R5B DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
