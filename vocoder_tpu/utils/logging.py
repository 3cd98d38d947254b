"""Rank-zero logging: console + metrics.jsonl + optional TensorBoard.

The analogue of the reference's loguru rank-zero wrapper + W&B/TensorBoard
fan-out (utils/logger.py:6-15, configs/logger/*).  W&B needs network egress,
so the durable record here is a metrics.jsonl stream (+ tensorboardX when
available); both are rank-zero only.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def log(msg: str) -> None:
    if is_main_process():
        ts = time.strftime("%Y-%m-%d %H:%M:%S")
        print(f"[{ts}] {msg}", file=sys.stderr, flush=True)


class MetricsLogger:
    def __init__(self, workdir: str | Path, use_tensorboard: bool = True, use_wandb: bool = False, project: str = "tpu-vocoder"):
        self.main = is_main_process()
        self.wandb = None
        if not self.main:
            self.jsonl = None
            self.tb = None
            return
        workdir = Path(workdir)
        workdir.mkdir(parents=True, exist_ok=True)
        self.workdir = workdir
        self.jsonl = open(workdir / "metrics.jsonl", "a")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(workdir / "tb"))
            except Exception:
                self.tb = None
        if use_wandb:  # reference default logger (configs/logger/wandb.yaml); gated on the package
            try:
                import wandb

                self.wandb = wandb.init(project=project, dir=str(workdir), resume="allow")
            except Exception:
                self.wandb = None

    def write(self, step: int, metrics: dict) -> None:
        if not self.main:
            return
        scalars = {k: float(v) for k, v in metrics.items()}
        self.jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)

    def add_audio(self, step: int, tag: str, audio, sample_rate: int) -> None:
        if not self.main:
            return
        if self.tb is not None:
            try:  # tensorboardX audio encoding needs soundfile, absent here
                self.tb.add_audio(tag, audio.reshape(-1, 1), step, sample_rate=sample_rate)
            except Exception:
                pass
        if self.wandb is not None:
            # Media fan-out to the active logger, matching the reference's
            # logger.experiment.log({...: wandb.Audio(...)})
            # (fish_vocoder/models/vocoder.py:80-116).
            try:
                import wandb

                self.wandb.log(
                    {tag: wandb.Audio(audio.reshape(-1), sample_rate=sample_rate)}, step=step
                )
            except Exception:
                pass

    def add_figure(self, step: int, tag: str, fig) -> None:
        """Log a matplotlib figure: PNG under workdir/media (durable record),
        plus TensorBoard and the active W&B run when available; closes the
        figure (the reference's add_figure fan-out, models/vocoder.py:80-116)."""
        if not self.main or fig is None:
            return
        try:
            media = self.workdir / "media"
            media.mkdir(parents=True, exist_ok=True)
            fig.savefig(media / f"{tag.replace('/', '_')}_{step:08d}.png", dpi=110)
            if self.tb is not None:
                self.tb.add_figure(tag, fig, step)
            if self.wandb is not None:
                try:
                    import wandb

                    self.wandb.log({tag: wandb.Image(fig)}, step=step)
                except Exception:
                    pass
        except Exception:
            pass
        finally:
            import matplotlib.pyplot as plt

            plt.close(fig)

    def close(self):
        if self.jsonl is not None:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
