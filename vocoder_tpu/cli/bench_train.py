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
import functools
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="GAN train-step throughput")
    ap.add_argument("--model", default="hifigan")
    ap.add_argument("--resolution", default="44100_512_2048")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--spectral-precision", default="highest")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--g-only", action="store_true", help="skip the discriminator phase")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.train import gan as gan_mod

    cfg = build_task_config(model=args.model, resolution=args.resolution).replace(
        compute_dtype=args.compute_dtype, spectral_precision=args.spectral_precision
    )
    tx = gan_mod.make_optimizer(cfg)
    t_samples = cfg.num_frames * cfg.hop_length
    state = gan_mod.create_train_state(jax.random.key(0), cfg)
    batch = {
        "audio": jnp.asarray(np.random.default_rng(0).standard_normal((args.batch, 1, t_samples)), jnp.float32) * 0.1,
        "lengths": jnp.full((args.batch,), t_samples, jnp.int32),
    }

    @functools.partial(jax.jit, donate_argnums=(0,))
    def g_phase(state, b):
        audio, lengths = b["audio"], b["lengths"]
        mask = gan_mod.sequence_mask(lengths, audio.shape[2])
        rng, step_rng = jax.random.split(state.rng)
        (loss_g, (gm, ac, fc, ne)), grads = jax.value_and_grad(gan_mod._generator_loss, has_aux=True)(
            state.gen_params, state.disc_params, audio, mask, cfg, step_rng, state.extra, None, None
        )
        up, og = tx.update(grads, state.opt_g, state.gen_params)
        gp = optax.apply_updates(state.gen_params, up)
        return state.replace(gen_params=gp, opt_g=og, rng=rng, extra=ne), gm, ac, fc

    @functools.partial(jax.jit, donate_argnums=(0,))
    def d_phase(state, ac, fc):
        (loss_d, dm), grads = jax.value_and_grad(gan_mod._discriminator_loss_fn, has_aux=True)(
            state.disc_params, ac, fc, cfg
        )
        up, od = tx.update(grads, state.opt_d, state.disc_params)
        dp = optax.apply_updates(state.disc_params, up)
        return state.replace(step=state.step + 1, disc_params=dp, opt_d=od), dm

    def sync(state):
        float(jnp.sum(jax.tree.leaves(state.gen_params)[0]))

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
    return rec


if __name__ == "__main__":
    main()
