"""Profile generator inference and print an op-level time breakdown.

Runs the same jitted forward as cli.bench_infer under jax.profiler, then
parses the xplane trace (tensorflow proto, no TensorBoard UI needed) and
aggregates device-plane op durations by fusion/op name so the next kernel
lever is chosen from data, not guesses (BENCH.md round-2 methodology).

    python scripts/profile_infer.py --model bigvgan --batch 16 --top 30
"""

from __future__ import annotations

import argparse
import collections
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))  # repo root


def parse_xplane(trace_dir: pathlib.Path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(trace_dir.rglob("*.xplane.pb"))
    assert paths, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(paths[-1].read_bytes())

    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        # Prefer the "XLA Ops" lines (per-op events); module/step lines
        # overlap them and would double-count — and so would "Async XLA Ops"
        # (async copy windows span the compute they overlap; counting them
        # inflated the r5a BigVGAN train profile 7x before this filter).
        lines = [
            l for l in plane.lines if "XLA Ops" in l.name and "Async" not in l.name
        ] or list(plane.lines)
        per_op = collections.Counter()
        for line in lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                per_op[name] += ev.duration_ps / 1e9  # -> ms
        if per_op:
            rows.append((plane.name, per_op))
    if not rows:
        print("no device plane with events found; planes were:")
        for plane in xs.planes:
            print(f"  {plane.name}: lines {[l.name for l in plane.lines][:8]}")
    return rows


def bucket(name: str) -> str:
    """Collapse fusion names into readable buckets."""
    n = name.lower()
    if "conv" in n or "dot" in n:
        return "conv/dot"
    if "transpose" in n:
        return "transpose/copy"
    if "fusion" in n:
        return "fusion(elementwise)"
    if "copy" in n or "reshape" in n or "bitcast" in n:
        return "copy/reshape"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bigvgan")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None, help="trace dir (default: temp)")
    ap.add_argument("--train", action="store_true", help="profile the split G+D train step instead")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from vocoder_tpu import nn
    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.models.registry import get_generator

    task = build_task_config(args.model, args.resolution)
    if args.train:
        import numpy as np

        from vocoder_tpu.train import gan as gan_mod

        cfg = task.replace(compute_dtype="bfloat16")
        t_samples = cfg.num_frames * cfg.hop_length
        state = gan_mod.create_train_state(jax.random.key(0), cfg)
        batch = {
            "audio": jnp.asarray(
                np.random.default_rng(0).standard_normal((args.batch, 1, t_samples)), jnp.float32
            )
            * 0.1,
            "lengths": jnp.full((args.batch,), t_samples, jnp.int32),
        }
        step = gan_mod.make_train_step_split(cfg)

        def run(_p, _m):
            nonlocal state
            state, gm, ac, fc = step.g_phase(state, batch)
            state, dm = step.d_phase(state, ac, fc)
            return gm["train/generator/all"]

        params, mel = None, None
        float(run(None, None))  # compile + warmup
    else:
        gen = get_generator(task.generator_name)
        nn.set_default_precision(lax.Precision.DEFAULT)
        params = gen.init(jax.random.key(0), task.generator)
        params = nn.fold_weight_norm(params)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        mel = jnp.zeros((args.batch, task.num_mels, args.frames), jnp.bfloat16)

        @jax.jit
        def run(p, m):
            return gen.apply(p, m, task.generator)

        float(jnp.sum(run(params, mel)))  # compile + warmup

    trace_dir = pathlib.Path(args.out or tempfile.mkdtemp(prefix="prof_"))
    with jax.profiler.trace(str(trace_dir)):
        out = None
        for _ in range(args.iters):
            out = run(params, mel)
        float(jnp.sum(out))

    for plane, per_op in parse_xplane(trace_dir):
        total = sum(per_op.values())
        print(f"\n== {plane}: {total:.2f} ms total over {args.iters} iters ==")
        buckets = collections.Counter()
        for name, ms in per_op.items():
            buckets[bucket(name)] += ms
        for b, ms in buckets.most_common():
            print(f"  {b:<24} {ms:8.2f} ms  {100*ms/total:5.1f}%")
        print(f"  -- top {args.top} ops --")
        for name, ms in per_op.most_common(args.top):
            print(f"  {ms:8.2f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
