"""Offline evaluation CLI: pairwise metrics between source and generated dirs.

The analogue of fish_vocoder/eval.py:44-97: mel-L1 ("spec_diff") with the
fixed 24 kHz / 1024-fft / 256-hop / 128-mel analyzer, plus PESQ-NB (8 kHz)
and PESQ-WB (16 kHz).  PESQ always runs: the native P.862 implementation
(vocoder_tpu/pesq_native.py) needs no C extension; the ITU extension is used
automatically if it ever becomes importable.  SI-SDR and MCD round out the
metric set.

    python -m vocoder_tpu.cli.evaluate SOURCE_DIR GENERATED_DIR --sr 24000
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from vocoder_tpu.data.audio_io import read_audio
from vocoder_tpu.data.resample import resample
from vocoder_tpu.ops import log_mel_spectrogram

from vocoder_tpu.eval_metrics import pesq as _pesq  # ITU C ext if present, else native P.862


def spec_difference(source: np.ndarray, generated: np.ndarray, sr: int) -> float:
    """mel-L1 with the eval.py:55 analyzer (sr, 1024 fft, 1024 win, 256 hop, 128 mel)."""
    kw = dict(sample_rate=sr, n_fft=1024, win_length=1024, hop_length=256, n_mels=128)
    a = log_mel_spectrogram(jnp.asarray(source[None]), **kw)
    b = log_mel_spectrogram(jnp.asarray(generated[None]), **kw)
    return float(jnp.mean(jnp.abs(a - b)))


def pesq_score(target: np.ndarray, preds: np.ndarray, sr: int, mode: str) -> float:
    rate = 8000 if mode == "nb" else 16000
    t = resample(target, sr, rate)
    p = resample(preds, sr, rate)
    return _pesq(t, p, rate, mode)


def _eval_pair(f: Path, g: Path, sr: int, is_vocal: bool) -> dict:
    """All metrics for one (source, generated) pair; raises on failure."""
    from vocoder_tpu.eval_metrics import mcd, si_sdr

    s_audio, s_sr = read_audio(f)
    g_audio, g_sr = read_audio(g)
    s = resample(s_audio.mean(0), s_sr, sr)
    p = resample(g_audio.mean(0), g_sr, sr)
    n = min(len(s), len(p))
    assert max(len(s) - n, len(p) - n) < 1000, "length mismatch > 1000 samples"
    s, p = s[:n], p[:n]

    out = {}
    if is_vocal:
        out["pesq_nb"] = pesq_score(s, p, sr, "nb")
        out["pesq_wb"] = pesq_score(s, p, sr, "wb")
    out["spec_diff"] = spec_difference(s, p, sr)
    out["si_sdr"] = si_sdr(s, p)
    out["mcd"] = mcd(s, p, sr)
    return out


def _worker_init():
    # Metric workers must never touch the accelerator: force the CPU backend
    # before anything initialises it (a spawn-context process, so this runs
    # ahead of any jax use).
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def main(argv=None):
    ap = argparse.ArgumentParser(description="Offline vocoder evaluation")
    ap.add_argument("source")
    ap.add_argument("generated")
    ap.add_argument("--sr", type=int, default=24000)
    ap.add_argument("--glob-pattern", default="*.wav")
    ap.add_argument("--is-vocal", action="store_true", default=True)
    ap.add_argument("--is-instrumental", dest="is_vocal", action="store_false")
    ap.add_argument("--workers", type=int, default=1, help="parallel metric processes (PESQ is CPU-bound)")
    args = ap.parse_args(argv)

    source, generated = Path(args.source), Path(args.generated)
    assert source.is_dir() and generated.is_dir()
    files = sorted(source.rglob(args.glob_pattern))
    if not files:
        raise SystemExit(
            f"no files in {source} match {args.glob_pattern!r} — pass "
            "--glob-pattern (e.g. '*.flac') for non-WAV corpora"
        )
    pairs = []
    for f in files:
        g = generated / f.relative_to(source)
        for suffix in (".flac", ".wav"):
            if not g.exists():
                g = g.with_suffix(suffix)
        if not g.exists():
            print(f"{g} does not exist")
            continue
        pairs.append((f, g))

    scores = defaultdict(list)
    errors = 0

    def record(f, result):
        nonlocal errors
        if isinstance(result, Exception):
            # Per-file tolerance for corrupt clips, but LOUD (the reference's
            # bare `print` at eval.py:87-89 can mask a broken metric as "a few
            # skipped files") and fail-fast when everything fails.
            errors += 1
            print(f"Error processing {f}: {type(result).__name__}: {result}")
            return
        for k, v in result.items():
            scores[k].append(v)

    if args.workers > 1:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(
            max_workers=args.workers, mp_context=mp.get_context("spawn"), initializer=_worker_init
        ) as pool:
            futures = [(f, pool.submit(_eval_pair, f, g, args.sr, args.is_vocal)) for f, g in pairs]
            for f, fut in futures:
                try:
                    record(f, fut.result())
                except Exception as e:
                    record(f, e)
    else:
        for f, g in pairs:
            try:
                record(f, _eval_pair(f, g, args.sr, args.is_vocal))
            except Exception as e:
                record(f, e)

    if not pairs:
        raise SystemExit(
            f"no generated file matches any of the {len(files)} source files — "
            "check the generated dir layout / extensions"
        )
    if errors:
        print(f"warning: {errors}/{len(pairs)} file pairs failed to evaluate")
    if errors == len(pairs):
        raise SystemExit("every file pair failed — the metric pipeline is broken, not the data")
    print("Average scores:")
    for k, v in scores.items():
        print(f"    {k}: {np.mean(v):.4f}")
    return {k: float(np.mean(v)) for k, v in scores.items()}


if __name__ == "__main__":
    main()
