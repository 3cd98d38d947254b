"""Scaling-efficiency benchmark: GAN train-step throughput vs mesh size.

BASELINE.md targets: "GAN training step time — measured at 1 chip, 1 host,
N hosts; scaling efficiency >= 85%".  On real hardware this runs on whatever
devices are attached (one process per host, jax.distributed); without a pod
it exercises the identical program on virtual CPU devices
(--virtual N), which validates the sharding/collective structure end to end.

    python -m vocoder_tpu.cli.bench_scaling --virtual 8 --meshes 1,2,4,8
    python -m vocoder_tpu.cli.bench_scaling --model vocos --batch 16
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0, help="fake N CPU devices")
    ap.add_argument("--meshes", default="1,2,4,8", help="data-axis sizes to test")
    ap.add_argument("--model", default="hifigan")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument("--batch", type=int, default=8, help="per-data-shard batch")
    ap.add_argument("--num-frames", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tiny", action="store_true", help="use the tiny test config (CPU-friendly)")
    args = ap.parse_args(argv)

    import os

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={args.virtual}"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.parallel import batch_sharding, make_mesh, shard_train_state
    from vocoder_tpu.train import gan

    if args.tiny:
        from tests.test_gan_step import tiny_cfg

        task = tiny_cfg(crop=True)
    else:
        task = build_task_config(args.model, args.resolution).replace(num_frames=args.num_frames)

    t = task.hop_length * task.num_frames
    audio_s_per_item = t / task.sampling_rate
    results = []
    base = None
    for dp in [int(x) for x in args.meshes.split(",")]:
        if dp > len(jax.devices()):
            continue
        mesh = make_mesh(data=dp, model=1, devices=jax.devices()[:dp])
        b = args.batch * dp  # weak scaling: constant per-device batch
        state = gan.create_train_state(jax.random.key(0), task)
        state = shard_train_state(state, mesh)
        rng = np.random.default_rng(0)
        batch = {
            "audio": jax.device_put(
                jnp.asarray(rng.standard_normal((b, 1, t)) * 0.3, jnp.float32), batch_sharding(mesh)
            ),
            "lengths": jax.device_put(jnp.full((b,), t, jnp.int32), batch_sharding(mesh)),
        }
        step = jax.jit(gan.make_train_step(task), donate_argnums=0)
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        start = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch)
        float(metrics["train/generator/all"])  # readback sync
        dt = (time.perf_counter() - start) / args.iters
        tput = b * audio_s_per_item / dt
        if base is None:
            base = tput / dp
        eff = tput / (dp * base)
        results.append({"data_parallel": dp, "step_ms": round(dt * 1000, 2), "audio_s_per_s": round(tput, 2), "efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main()
