"""Orbax checkpointing: periodic saves, auto-resume, weights-only resume.

Capability parity with the reference's Lightning ModelCheckpoint + resume
logic (configs/callbacks/default.yaml:8-17 — every 20k steps, keep all;
train.py:81-95 — auto-resume from the latest checkpoint, optional
``resume_weights_only`` that loads parameters but fresh optimizers).  Orbax
gives async multi-host-safe saves of the full TrainState pytree.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, save_interval_steps: int = 20_000, max_to_keep: int | None = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=save_interval_steps,
                max_to_keep=max_to_keep,  # None == keep all (save_top_k: -1)
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self.manager.save(step, args=ocp.args.StandardSave(state), force=force)

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, abstract_state: Any, step: int | None = None) -> Any:
        """Full resume: params + optimizers + step + rng."""
        step = step if step is not None else self.latest_step()
        return self.manager.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def restore_weights_only(self, state: Any, step: int | None = None) -> Any:
        """Load gen/disc params from the checkpoint, keep fresh optimizers/step.

        The analogue of resume_weights_only / strict=False (train.py:89-95).
        """
        restored = self.restore(jax.tree.map(ocp.utils.to_shape_dtype_struct, state), step)
        # extra carries non-gradient model state (EMA VQ codebooks) — weights-like.
        return state.replace(
            gen_params=restored.gen_params, disc_params=restored.disc_params, extra=restored.extra
        )

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.close()


def abstract_like(state: Any) -> Any:
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
