"""Datasets + batch pipeline: host CPU -> fixed-shape device batches.

Capability parity with /root/reference/fish_vocoder/data/datasets/
{vocoder,mix}.py and datamodules/naive.py: file lists from a directory walk or
a filelist text file, per-item transform chains with peak normalisation, and a
weighted infinite mix (hifi-8000h 0.8 / vocoder-data-441 0.1 / libritts 0.1 in
the shipped config, configs/data/vocoder.yaml:17-32).

TPU-first differences:
- batches are FIXED-SHAPE (pad/crop to hop*num_frames + a lengths vector) so
  the jitted train step never recompiles — the XLA equivalent of the
  reference's dynamic right-pad collate (vocoder.py:47-58);
- seeding is explicit and hierarchical: (seed, host_index, stream) — per-host
  data sharding replaces the reference's rank-and-pid seeding (mix.py:19-26,
  quirk Q5) and is reproducible on resume via the step counter;
- a background thread overlaps decode/augment with device compute and
  device_put's straight into the (possibly sharded) batch layout.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator, Sequence

import numpy as np

from vocoder_tpu.data.audio_io import list_audio_files


@dataclass
class VocoderDataset:
    """Map-style dataset over audio paths (datasets/vocoder.py:11-44)."""

    root: str | Path
    transform: Callable  # (rng, path) -> (C, T) float32

    def __post_init__(self):
        root = Path(self.root)
        assert root.exists(), f"Path {root} does not exist."
        if root.is_dir():
            self.paths = [str(p) for p in list_audio_files(root, recursive=True)]
        else:
            self.paths = [line for line in root.read_text().splitlines() if line.strip()]

    def __len__(self) -> int:
        return len(self.paths)

    def get(self, rng: np.random.Generator, idx: int) -> np.ndarray:
        audio = self.transform(rng, self.paths[idx])
        peak = float(np.max(np.abs(audio))) if audio.size else 0.0
        if peak >= 1.0:
            audio = audio / (peak / 0.99)
        return audio


@dataclass
class MixDataset:
    """Weighted infinite mix (datasets/mix.py:10-33)."""

    datasets: Sequence[VocoderDataset]
    probs: Sequence[float]

    def __post_init__(self):
        total = float(sum(self.probs))
        self.probs = [p / total for p in self.probs]

    def sample(self, rng: np.random.Generator) -> np.ndarray:
        ds = self.datasets[int(rng.choice(len(self.datasets), p=self.probs))]
        return ds.get(rng, int(rng.integers(0, len(ds))))


def _fix_length(audio: np.ndarray, target: int) -> tuple[np.ndarray, int]:
    t = audio.shape[-1]
    if t >= target:
        return audio[..., :target], target
    pad = target - t
    return np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)]), t


def batch_iterator(
    sample_fn: Callable[[np.random.Generator], np.ndarray],
    *,
    batch_size: int,
    target_length: int,
    seed: int = 594461,  # configs/train.yaml:53
    host_index: int = 0,
    start_step: int = 0,
) -> Iterator[dict]:
    """Infinite {audio (B,1,T), lengths (B,)} batches with fixed shapes."""
    step = start_step
    while True:
        rng = np.random.default_rng((seed, host_index, step))
        audios, lengths = [], []
        for _ in range(batch_size):
            a = sample_fn(rng)
            if a.ndim == 1:
                a = a[None, :]
            a, ln = _fix_length(a[:1], target_length)
            audios.append(a)
            lengths.append(ln)
        yield {
            "audio": np.stack(audios).astype(np.float32),
            "lengths": np.asarray(lengths, np.int64),
        }
        step += 1


class DevicePrefetcher:
    """Background thread: host batches -> device (sharded) arrays, depth-N queue.

    Single-host: device_put with the batch sharding.  Multi-host: each host
    contributes its local shard of the global batch via
    jax.make_array_from_process_local_data (the GSPMD analogue of DDP's
    per-rank loaders, SURVEY.md §2.10).
    """

    def __init__(self, iterator: Iterator[dict], sharding=None, depth: int = 2):
        import jax

        self._iterator = iterator
        self._sharding = sharding
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        multihost = jax.process_count() > 1

        def put(batch):
            if sharding is not None and multihost:
                return {
                    k: jax.make_array_from_process_local_data(sharding, v) for k, v in batch.items()
                }
            if sharding is not None:
                return {k: jax.device_put(v, sharding) for k, v in batch.items()}
            return {k: jax.device_put(v) for k, v in batch.items()}

        def worker():
            try:
                for batch in self._iterator:
                    if self._stop.is_set():
                        return
                    self._queue.put(put(batch))
            except BaseException as e:  # surface errors to the consumer
                self._queue.put(e)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass
