"""Inference throughput benchmark for any generator family.

The harness behind BENCH.md's inference table:

    python -m vocoder_tpu.cli.bench_infer --model bigvgan --batch 16
    python -m vocoder_tpu.cli.bench_infer --model vocos --batch 64 --frames 256

Prints one JSON line: ms/call and generated audio-seconds per second per chip
(weight-norm folded, bf16 by default, params passed as jit args).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="Generator inference throughput")
    ap.add_argument("--model", default="hifigan")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16", choices=("bfloat16", "float32"))
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from vocoder_tpu import nn
    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.models.registry import get_generator

    task = build_task_config(args.model, args.resolution)
    gen = get_generator(task.generator_name)
    if args.dtype == "bfloat16":
        nn.set_default_precision(lax.Precision.DEFAULT)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = gen.init(jax.random.key(0), task.generator)
    params = nn.fold_weight_norm(params)
    params = jax.tree.map(lambda x: x.astype(dtype), params)
    mel = jnp.zeros((args.batch, task.num_mels, args.frames), dtype)

    @jax.jit
    def run(p, m):  # params as args: closure constants wedge the compiler at scale
        return gen.apply(p, m, task.generator)

    float(jnp.sum(run(params, mel)))  # compile + warmup
    start = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = run(params, mel)
    float(jnp.sum(out))  # force the chain (block_until_ready under-reports remotely)
    ms = (time.perf_counter() - start) / args.iters * 1000.0

    audio_s = args.batch * args.frames * task.hop_length / task.sampling_rate
    rec = {
        "metric": "generator_inference",
        "model": args.model,
        "backend": jax.default_backend(),
        "batch": args.batch,
        "frames": args.frames,
        "dtype": args.dtype,
        "ms_per_call": round(ms, 1),
        "audio_s_per_s_per_chip": round(audio_s / (ms / 1000.0), 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    main()
