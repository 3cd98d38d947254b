"""Benchmark: generated audio-seconds per second per chip (HiFiGAN inference).

Runs the flagship full-size 44.1 kHz HiFiGAN generator (BASELINE.md config 1)
on the available accelerator and prints ONE JSON line.

The reference publishes no numbers (BASELINE.json "published": {}), so
``vs_baseline`` is anchored to real-time synthesis: vs_baseline == generated
audio-seconds per wall-clock second per chip (x real-time).
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from vocoder_tpu import nn
    from vocoder_tpu.models import hifigan

    # Benchmarks run at standard (speed) precision; parity tests use HIGHEST.
    nn.set_default_precision(lax.Precision.DEFAULT)

    cfg = hifigan.HiFiGANConfig()  # 44.1 kHz, hop 512, 512 channels
    params = hifigan.init(jax.random.key(0), cfg)

    batch, frames = 4, 256  # 4 x ~2.97 s of audio per call
    sr = 44100
    audio_seconds_per_call = batch * frames * cfg.hop_length / sr

    @jax.jit
    def run(mel):
        return hifigan.apply(params, mel, cfg)

    mel = jnp.zeros((batch, cfg.num_mels, frames), jnp.float32)
    out = run(mel)
    jax.block_until_ready(out)  # compile + warmup

    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        out = run(mel)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    value = audio_seconds_per_call * n_iters / elapsed
    print(
        json.dumps(
            {
                "metric": "hifigan_inference_audio_seconds_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
