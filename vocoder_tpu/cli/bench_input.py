"""Input-pipeline throughput benchmark (host decode/augment only, no device).

Measures what the worker-pool batch pipeline (data/dataset.py::batch_iterator,
the reference's DataLoader num_workers analogue) can sustain — so input
starvation against a measured train-step rate is a one-command check
(VERDICT round-1 weak #5: at batch 16 with p=0.5 polyphase pitch shift on
44.1 kHz audio, a single worker starves the step).

    python -m vocoder_tpu.cli.bench_input --workers 1,4,8 --batch 16

Prints one JSON line per worker count: batches/s and the equivalent
audio-seconds ingested per second (compare against the train bench's
audio-s/s to check the pipeline outruns the step).
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np


def _make_corpus(root: Path, n_files: int, seconds: float, sr: int, fmt: str = "wav") -> None:
    from vocoder_tpu.data.audio_io import write_wav
    from vocoder_tpu.data.flac import write_flac

    rng = np.random.default_rng(0)
    for i in range(n_files):
        t = np.arange(int(sr * seconds)) / sr
        wave = 0.4 * np.sin(2 * np.pi * (120 + 17 * i) * t) + 0.02 * rng.standard_normal(t.shape)
        wave = wave.astype(np.float32)
        if fmt == "flac":
            write_flac(root / f"clip{i:03d}.flac", wave, sr)
        elif fmt == "mp3":
            from vocoder_tpu.data.mp3 import write_mp3

            write_mp3(root / f"clip{i:03d}.mp3", wave, sr)
        elif fmt == "ogg":
            from vocoder_tpu.data.ogg import write_ogg

            write_ogg(root / f"clip{i:03d}.ogg", wave, sr)
        else:
            write_wav(root / f"clip{i:03d}.wav", wave, sr)


def main(argv=None):
    ap = argparse.ArgumentParser(description="host input-pipeline throughput")
    ap.add_argument("--corpus", default=None, help="audio dir; synthetic 44.1 kHz clips if omitted")
    ap.add_argument("--workers", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num-frames", type=int, default=128)
    ap.add_argument("--hop", type=int, default=512)
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--format", default="wav", choices=("wav", "flac", "mp3", "ogg"),
                    help="synthetic-corpus codec (flac = native C++ decode path; "
                    "mp3/ogg = system-library ctypes decode paths)")
    args = ap.parse_args(argv)

    from vocoder_tpu.data import transforms as T
    from vocoder_tpu.data.dataset import MixDataset, VocoderDataset, batch_iterator

    tmp = None
    corpus = args.corpus
    if corpus is None:
        tmp = tempfile.TemporaryDirectory()
        corpus = Path(tmp.name)
        _make_corpus(corpus, n_files=24, seconds=4.0, sr=args.sr, fmt=args.format)

    tr = T.train_transform(args.sr, args.hop, args.num_frames)
    ds = VocoderDataset(root=corpus, transform=tr)
    sample_fn = MixDataset(datasets=[ds], probs=[1.0]).sample
    target_len = args.hop * args.num_frames
    audio_s_per_batch = args.batch * target_len / args.sr

    results = []
    for workers in [int(w) for w in args.workers.split(",")]:
        it = batch_iterator(
            sample_fn, batch_size=args.batch, target_length=target_len, num_workers=workers
        )
        next(it)  # warm (thread-pool spin-up, file cache)
        t0 = time.perf_counter()
        for _ in range(args.batches):
            next(it)
        dt = time.perf_counter() - t0
        it.close()
        rec = {
            "metric": "input_pipeline_batches_per_s",
            "format": args.format if args.corpus is None else "corpus",
            "num_workers": workers,
            "batch_size": args.batch,
            "value": round(args.batches / dt, 2),
            "audio_s_per_s": round(args.batches * audio_s_per_batch / dt, 1),
            "unit": "batches/s",
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if tmp is not None:
        tmp.cleanup()
    return results


if __name__ == "__main__":
    main()
