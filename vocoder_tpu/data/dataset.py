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
        # Fail fast on undecodable formats at CONSTRUCTION, not as silence at
        # step 50k (round-1 weak #1).  The reference's torchaudio decodes
        # mp3/ogg too; this build decodes wav+flac natively and mp3 when
        # libmpg123 is present.
        from vocoder_tpu.data.audio_io import DECODABLE_EXTENSIONS

        bad = sorted({Path(p).suffix.lower() for p in self.paths} - DECODABLE_EXTENSIONS)
        if bad:
            examples = [p for p in self.paths if Path(p).suffix.lower() in bad][:5]
            raise ValueError(
                f"{root}: {bad} files are not decodable (supported: "
                f"{sorted(DECODABLE_EXTENSIONS)}); e.g. {examples}. Convert the corpus "
                "or filter the filelist."
            )

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
    num_workers: int = 1,
    template_fn: Callable[[np.ndarray], np.ndarray] | None = None,
    batch_feature_fn: Callable[[np.ndarray], np.ndarray] | None = None,
) -> Iterator[dict]:
    """Infinite {audio (B,1,T), lengths (B,)} batches with fixed shapes.

    Each batch ELEMENT gets its own hierarchical rng key (seed, host, step,
    slot), so the produced stream is byte-identical for ANY num_workers — the
    worker pool (DataLoader num_workers analogue, naive.py:34-72) only changes
    wall-clock.  Decode/resample are numpy/C++ and release the GIL, so a
    thread pool parallelises the real work without pickling audio buffers.
    """

    def element(step: int, slot: int) -> tuple[np.ndarray, int, np.ndarray | None]:
        rng = np.random.default_rng((seed, host_index, step, slot))
        a = sample_fn(rng)
        if a.ndim == 1:
            a = a[None, :]
        a, ln = _fix_length(a[:1], target_length)
        # Template from the FINAL (augmented, cropped) audio so f0 matches what
        # the generator must reconstruct (refinegan.py:287-299 contract).
        tpl = template_fn(a[0]) if template_fn is not None else None
        return a, ln, tpl

    pool = None
    if num_workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=num_workers, thread_name_prefix="data-worker")
    try:
        step = start_step
        while True:
            if pool is None:
                items = [element(step, i) for i in range(batch_size)]
            else:
                items = list(pool.map(lambda i: element(step, i), range(batch_size)))
            batch = {
                "audio": np.stack([a for a, _, _ in items]).astype(np.float32),
                "lengths": np.asarray([ln for _, ln, _ in items], np.int64),
            }
            if template_fn is not None:
                tpl = np.stack([t for _, _, t in items]).astype(np.float32)
                batch["template"] = tpl[:, None, :] if tpl.ndim == 2 else tpl
            if batch_feature_fn is not None:
                # Host-side frozen-backbone features (ssl family): computed on
                # the whole batch so the torch backbone batches internally.
                batch["ssl_features"] = np.asarray(
                    batch_feature_fn(batch["audio"][:, 0, :]), np.float32
                )
            yield batch
            step += 1
    finally:
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)


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
        self._wait_seconds = 0.0

    def __iter__(self):
        return self

    def __next__(self):
        import time

        t0 = time.perf_counter()
        item = self._queue.get()
        self._wait_seconds += time.perf_counter() - t0
        if isinstance(item, BaseException):
            raise item
        return item

    def wait_seconds(self, reset: bool = False) -> float:
        """Cumulative seconds the consumer blocked on the input pipeline —
        the starvation signal (>0 per window means the pipeline can't feed
        the step rate)."""
        w = self._wait_seconds
        if reset:
            self._wait_seconds = 0.0
        return w

    def close(self):
        self._stop.set()
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass
