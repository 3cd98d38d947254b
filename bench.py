"""Benchmark: generated audio-seconds per second per chip (HiFiGAN inference).

Runs the flagship full-size 44.1 kHz HiFiGAN generator (BASELINE.md config 1)
in throughput mode — folded weight norm, bf16, batch 128 of ~3 s utterances —
and prints ONE JSON line.

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


def main():
    from vocoder_tpu import nn
    from vocoder_tpu.models import hifigan

    nn.set_default_precision(lax.Precision.DEFAULT)

    cfg = hifigan.HiFiGANConfig()  # 44.1 kHz, hop 512, 512 channels
    params = hifigan.init(jax.random.key(0), cfg)
    params = nn.fold_weight_norm(params)  # inference mode (remove_parametrizations analogue)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    batch, frames, sr = 128, 256, 44100
    audio_seconds_per_call = batch * frames * cfg.hop_length / sr  # ~190 s

    @jax.jit
    def _run(p, mel):  # params as args (large closure constants wedge the compiler)
        return hifigan.apply(p, mel, cfg)

    def run(mel):
        return _run(params, mel)

    mel = jnp.zeros((batch, cfg.num_mels, frames), jnp.bfloat16)
    float(jnp.sum(run(mel)))  # compile + warmup (compiles are slow on this link)

    n_iters = 5
    start = time.perf_counter()
    out = None
    for _ in range(n_iters):
        out = run(mel)
    float(jnp.sum(out))  # force execution of the whole chain
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
