"""Benchmark: generated audio-seconds per second per chip, per flagship family.

Runs the three headline 44.1 kHz generators at their BENCH.md flagship batch
points — HiFiGAN b128, Vocos b128, BigVGAN b64 (the r5 measured knees) —
each with folded weight norm,
bf16, params-as-jit-args, and prints ONE JSON line per model (HiFiGAN first,
so single-line consumers keep reading the historical flagship metric).

The reference publishes no numbers (BASELINE.json "published": {}), so
``vs_baseline`` is anchored to real-time synthesis: vs_baseline == generated
audio-seconds per wall-clock second per chip (x real-time).

Timing uses a host readback after the loop: on the remote-attached TPU
backend, block_until_ready alone under-reports (async queueing), so the sum
readback forces full execution of the chain.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

# (model preset, batch) at each family's measured-knee flagship point.
CONFIGS = [
    ("hifigan", 128),
    ("vocos", 128),
    ("bigvgan", 64),
]

FRAMES = 256
N_ITERS = 5


def bench_one(model: str, batch: int) -> float:
    from vocoder_tpu import nn
    from vocoder_tpu.config import build_task_config
    from vocoder_tpu.models.registry import get_generator

    task = build_task_config(model)
    gen = get_generator(task.generator_name)

    params = gen.init(jax.random.key(0), task.generator)
    params = nn.fold_weight_norm(params)  # inference mode (remove_parametrizations analogue)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    mel = jnp.zeros((batch, task.num_mels, FRAMES), jnp.bfloat16)

    @jax.jit
    def run(p, m):  # params as args (large closure constants wedge the compiler)
        return gen.apply(p, m, task.generator)

    float(jnp.sum(run(params, mel)))  # compile + warmup (compiles are slow on this link)

    start = time.perf_counter()
    out = None
    for _ in range(N_ITERS):
        out = run(params, mel)
    float(jnp.sum(out))  # force execution of the whole chain
    elapsed = time.perf_counter() - start

    audio_seconds_per_call = batch * FRAMES * task.hop_length / task.sampling_rate
    return audio_seconds_per_call * N_ITERS / elapsed


def main():
    from vocoder_tpu import nn

    nn.set_default_precision(lax.Precision.DEFAULT)
    for model, batch in CONFIGS:
        value = bench_one(model, batch)
        print(
            json.dumps(
                {
                    "metric": f"{model}_inference_audio_seconds_per_s_per_chip",
                    "value": round(value, 2),
                    "unit": "audio_s/s/chip",
                    "vs_baseline": round(value, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
