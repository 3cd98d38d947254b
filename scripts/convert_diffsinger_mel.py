"""Convert DiffSinger segment-mel dumps to a single full-length mel tensor.

Analogue of reference scripts/convert_diffsinger_mel.py: stitch per-segment
mels (log10-scaled, /0.434294 -> ln) into one (1, T, 128) tensor initialised
at ln(1e-5) = -11.512925 silence, using 44.1 kHz / hop 512 frame offsets.

    python scripts/convert_diffsinger_mel.py IN.mel.pt OUT.mel.pt
"""

import argparse


def main():
    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--hop", type=int, default=512)
    args = ap.parse_args()

    data = torch.load(args.input, map_location="cpu")
    total = int(data[-1]["offset"] * args.sr / args.hop) + data[-1]["mel"].shape[1]
    all_mel = torch.zeros((1, total, 128)) - 11.512925  # ln(1e-5) silence floor
    for seg in data:
        offset = int(seg["offset"] * args.sr / args.hop)
        mel = seg["mel"] / 0.434294  # log10 -> ln
        all_mel[:, offset : offset + mel.shape[1], :] = mel
    torch.save(all_mel, args.output)
    print(f"wrote {args.output}: {tuple(all_mel.shape)}")


if __name__ == "__main__":
    main()
