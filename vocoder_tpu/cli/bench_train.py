"""Train-step throughput benchmark: split G/D phase timing on the current backend.

The harness behind BENCH.md's training table (v5e numbers measured with it):

    python -m vocoder_tpu.cli.bench_train --model hifigan --batch 8
    python -m vocoder_tpu.cli.bench_train --model bigvgan --g-only

Prints one JSON line per model with total/G/D ms per step and audio-s/s.
Timing chains N steps and forces the queue with a readback (on remote-attached
backends block_until_ready alone under-reports).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="GAN train-step throughput")
    ap.add_argument("--model", default="hifigan")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--spectral-precision", default="highest")
    ap.add_argument("--loss-stft-dtype", default="float32", choices=("float32", "bfloat16"))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--g-only", action="store_true", help="skip the discriminator phase")
    ap.add_argument(
        "--gen-checkpointing",
        action="store_true",
        help="rematerialize the generator's AMP blocks in the g-phase backward "
        "(trades recompute FLOPs for activation-save HBM traffic)",
    )
    ap.add_argument(
        "--memory-stats",
        action="store_true",
        help="print XLA memory_analysis of the compiled phases + live HBM after the run",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.train import gan as gan_mod

    cfg = build_task_config(model=args.model, resolution=args.resolution).replace(
        compute_dtype=args.compute_dtype,
        spectral_precision=args.spectral_precision,
        loss_stft_dtype=args.loss_stft_dtype,
    )
    if args.gen_checkpointing:
        import dataclasses

        if not any(f.name == "checkpointing" for f in dataclasses.fields(cfg.generator)):
            raise SystemExit(f"--gen-checkpointing: {type(cfg.generator).__name__} has no remat flag")
        cfg = cfg.replace(generator=dataclasses.replace(cfg.generator, checkpointing=True))
    t_samples = cfg.num_frames * cfg.hop_length
    state = gan_mod.create_train_state(jax.random.key(0), cfg)
    batch = {
        "audio": jnp.asarray(np.random.default_rng(0).standard_normal((args.batch, 1, t_samples)), jnp.float32) * 0.1,
        "lengths": jnp.full((args.batch,), t_samples, jnp.int32),
    }

    # THE phases the trainer runs (gan.make_train_step_split), not a copy:
    # grad-norm metrics, LR logging and family dispatch are all included.
    step = gan_mod.make_train_step_split(cfg)
    g_phase, d_phase = step.g_phase, step.d_phase

    def sync(state):
        float(jnp.sum(jax.tree.leaves(state.gen_params)[0]))

    if args.memory_stats:
        # AOT view of what the north-star model costs in HBM (VERDICT r2 #7):
        # argument (train-state) bytes + XLA temp/peak for each phase.
        compiled = g_phase.lower(state, batch).compile()
        ma = compiled.memory_analysis()
        mem = {
            "g_phase": {
                "argument_mb": round(getattr(ma, "argument_size_in_bytes", 0) / 2**20, 1),
                "output_mb": round(getattr(ma, "output_size_in_bytes", 0) / 2**20, 1),
                "temp_mb": round(getattr(ma, "temp_size_in_bytes", 0) / 2**20, 1),
                "peak_mb": round(getattr(ma, "peak_memory_in_bytes", 0) / 2**20, 1),
            }
        }
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and "flops" in ca:
            mem["g_phase"]["tflops"] = round(float(ca["flops"]) / 1e12, 3)
        print(json.dumps({"metric": "memory_analysis", "model": args.model, **mem}), flush=True)

    state, gm, ac, fc = g_phase(state, batch)
    if not args.g_only:
        state, dm = d_phase(state, ac, fc)
    sync(state)

    start = time.perf_counter()
    for _ in range(args.iters):
        state, gm, ac, fc = g_phase(state, batch)
        if not args.g_only:
            state, dm = d_phase(state, ac, fc)
    sync(state)
    total_ms = (time.perf_counter() - start) / args.iters * 1000.0

    start = time.perf_counter()
    for _ in range(args.iters):
        state, gm, ac, fc = g_phase(state, batch)
    sync(state)
    g_ms = (time.perf_counter() - start) / args.iters * 1000.0

    audio_s = args.batch * t_samples / cfg.sampling_rate
    rec = {
        "metric": "gan_train_step",
        "model": args.model,
        "backend": jax.default_backend(),
        "batch": args.batch,
        "compute_dtype": args.compute_dtype,
        "spectral_precision": args.spectral_precision,
        "total_ms": round(total_ms, 1),
        "g_ms": round(g_ms, 1),
        "audio_s_per_s": round(audio_s / (total_ms / 1000.0), 1),
    }
    print(json.dumps(rec), flush=True)
    if args.memory_stats:
        ms = jax.local_devices()[0].memory_stats() or {}
        keep = {k: v for k, v in ms.items() if "bytes" in k}
        print(json.dumps({"metric": "hbm_stats", "model": args.model, **keep}), flush=True)
    return rec


if __name__ == "__main__":
    main()
