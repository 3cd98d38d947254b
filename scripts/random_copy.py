"""Copy N random audio files from SRC to DST (val-set sampling).

Analogue of reference scripts/random_copy.py.

    python scripts/random_copy.py SRC DST NUM [--seed 42]
"""

import argparse
import random
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", type=Path)
    ap.add_argument("dst", type=Path)
    ap.add_argument("num", type=int)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    files = [f for f in args.src.rglob("*") if f.is_file() and f.suffix in (".wav", ".flac")]
    print(f"Found {len(files)} files in {args.src}")
    selected = random.Random(args.seed).sample(files, args.num)
    print(f"Copying {len(selected)} files to {args.dst}")
    for f in selected:
        dst = args.dst / f.relative_to(args.src)
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_bytes(f.read_bytes())
    print("Done")


if __name__ == "__main__":
    main()
