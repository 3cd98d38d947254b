"""Warmup-cosine LR schedule.

Parity with /root/reference/fish_vocoder/schedulers/warmup_cosine.py:6-56
(LambdaWarmUpCosineScheduler with base lr 1.0): linear warmup val_start ->
val_base over warm_up_steps, then cosine decay to val_final over
max_decay_steps.  Here it is a pure jnp function of the step counter, so the
per-step LR lives INSIDE the jitted train step — no host sync per step
(the reference steps a host-side LambdaLR each iteration, gan.py:277-280).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WarmupCosineConfig:
    val_base: float = 1e-4
    val_final: float = 0.0
    max_decay_steps: int = 5_000_000  # trainer.max_steps // 2 (configs/model/gan.yaml:29)
    val_start: float = 0.0
    warm_up_steps: int = 0


def warmup_cosine(step: jnp.ndarray, cfg: WarmupCosineConfig) -> jnp.ndarray:
    step = step.astype(jnp.float32)
    warm = cfg.warm_up_steps
    warmup_lr = (
        (cfg.val_base - cfg.val_start) / max(warm, 1) * step + cfg.val_start
    )
    t = (step - warm) / max(cfg.max_decay_steps - warm, 1)
    t = jnp.minimum(t, 1.0)
    cosine_lr = cfg.val_final + 0.5 * (cfg.val_base - cfg.val_final) * (
        1.0 + jnp.cos(t * jnp.pi)
    )
    return jnp.where(step < warm, warmup_lr, cosine_lr)
