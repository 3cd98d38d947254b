"""Fused BigVGAN AMP-stage Pallas kernel: one HBM pass per upsample stage.

The round-3 profile attributed BigVGAN inference (210.8 ms b16, BENCH.md) to
56% snake-transcendental elementwise fusions + 17% convs: the folded XLA
pipeline (models/bigvgan.py TAIL_FOLD) already removed the lane-padding
waste, but every conv op is still an HBM round-trip boundary — an AMP stage
is 18 aa-snakes + 18 dilated convs, each reading and writing the full
(B, T/r, 128) activation.  This kernel evaluates an ENTIRE stage — all
`resblock_kernel_sizes` AMP blocks (reference bigvgan.py:138-252), each with
its full dilation chain and residual adds, plus the 1/n_k output average
(reference bigvgan.py:361-365) — per VMEM tile: x is read from HBM once and
the averaged stage output written once.

Math per block (reference AMPBlock semantics, matching models.bigvgan
._amp_apply):
    for (c1, c2, a1, a2, d) in zip(convs1, convs2, acts1, acts2, dilations):
        xt = aa_snake(a1, x); xt = conv1d(c1, xt, pad=d*(k-1)//2, dil=d)
        xt = aa_snake(a2, xt); xt = conv1d(c2, xt, pad=(k-1)//2)
        x = x + xt
aa_snake is the interior polyphase form (ops/antialias.polyphase_taps) on the
VPU; convs are the folded structural-zero matmuls (nn._fold_index) as
row-shifted (L, L) MXU dots — the same MXU FLOPs as the XLA folded path.
Time shifts inside the fold ride the lane-roll + row-slice machinery from
ops/pallas/aa_snake.py.  All intermediates stay in VMEM in fp32 (Mosaic has
no bf16 sin; the fp32 residual chain is slightly MORE accurate than the XLA
path's bf16 stores).

Window bookkeeping: every intermediate is a plain jnp array paired with a
static Python `base` = the absolute window row its row 0 corresponds to.
Each op shrinks the valid region by its receptive field; `_block_shrink`
pre-computes the total so the halo DMA covers exactly the chain.

Sequence-edge semantics: the fused interior differs from the oracle
(_amp_apply: per-activation edge replication + splices, zero-padded convs)
within the chain's receptive field of each boundary; the wrapper recomputes
those edge rows with the XLA stage on short windows and splices them, so the
result equals the unfused stage end to end (tests/test_amp_fused.py).

Forward/inference only: training keeps the XLA path (a kernel call blocks
XLA's fusion with the conv gradients — measured rounds 2/3, BENCH.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vocoder_tpu.ops.antialias import polyphase_taps
from vocoder_tpu.ops.pallas.aa_snake import _lane_rolls, snake


# Tests flip this to run the kernel through the Pallas interpreter on CPU
# (models/bigvgan.py passes it through to amp_stage_supported/amp_stage_fused).
INTERPRET = False

import os as _os

# FIR lowering inside the folded (f > 1) stages:
#   "mm"      (default): both polyphase FIRs as packed folded matmuls — one
#             (L, 2L) MXU pass per row shift.  Won pre-poly-sin (218.1 vs
#             253.6 ms b16, BENCH.md r4) when the VPU was saturated by the
#             libm sin chain.
#   "shuffle" (the original v1 lowering): taps as lane-rolled selects + FMAs
#             on the VPU — near-zero MXU FLOPs (the mm form pays ~41 ms of
#             structural-zero matmuls at roofline across the f>1 stages).
#             Re-measurable now that poly-sin freed the VPU budget.
# MIXED (per-stage) lowering: a comma spec selects per fold factor, e.g.
#   VOCODER_AMP_FIR="mm,f2=shuffle" — shuffle on the f=2 stage, mm elsewhere.
# The fold factor f is a static property of each generator stage (128/C), so
# a per-f choice IS the per-stage choice the README roadmap describes.


def _parse_fir_spec(s: str) -> dict:
    spec: dict = {}
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
            if not (k.startswith("f") and k[1:].isdigit()):
                raise ValueError(
                    f"VOCODER_AMP_FIR entry {part!r}: per-stage keys look like 'f2=shuffle'"
                )
            spec[int(k[1:])] = v
        else:
            spec[None] = part
    for v in spec.values():
        if v not in ("mm", "shuffle"):
            raise ValueError(
                f"VOCODER_AMP_FIR backend {v!r} is not known; expected 'mm' or 'shuffle'"
            )
    return spec


_FIR_SPEC = _parse_fir_spec(_os.environ.get("VOCODER_AMP_FIR", "mm"))


def fir_backend(f: int) -> str:
    """FIR lowering for a stage with fold factor f (tests monkeypatch _FIR_SPEC)."""
    return _FIR_SPEC.get(f, _FIR_SPEC.get(None, "mm"))


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


def _round8(a: int) -> int:
    return max(_ceil(a, 8) * 8, 8)


# ---------------------------------------------------------------------------
# Static planning
# ---------------------------------------------------------------------------


def _conv_shifts(k: int, d: int, pad: int, f: int) -> tuple:
    """Row shifts q (in folded rows): out[n] = sum_q in[n + q] @ W_q
    (nn._fold_index convention: q in [qmin, qmax])."""
    if f == 1:
        return tuple(range(-pad, d * (k - 1) - pad + 1, d))
    from vocoder_tpu import nn

    _, _, qmin, qmax = nn._fold_index(k, f, pad, d)
    return tuple(range(qmin, qmax + 1))


def _fir_shifts(f: int) -> tuple[tuple, tuple]:
    """(up_shifts, down_shifts) for the aa-snake FIRs lowered as folded
    matmuls (f > 1): branch = 6-tap conv at padding 5, recombination = 6-tap
    conv at padding 0 (see polyphase_taps)."""
    return _conv_shifts(6, 1, 5, f), _conv_shifts(6, 1, 0, f)


def _aa_extra(f: int) -> tuple[int, int]:
    """(left, right) row shrink of one interior aa-snake at fold f.

    f > 1, "mm": both FIRs run as folded matmuls (their _fold_index shift
    ranges).  f > 1, "shuffle": branch taps read samples [-5, 0] (left reach
    ceil(5/f) rows), recombination reads samples [0, 5] (right reach a//f
    rows, +1 when the lane phase overflows).  f == 1: row-shift FMAs over
    samples [-5, 0] / [0, 5]."""
    if f > 1 and fir_backend(f) == "mm":
        up, dn = _fir_shifts(f)
        return -min(up) - min(dn), max(up) + max(dn)
    if f > 1:
        left = _ceil(5, f)
        right = max(a // f + (1 if a % f else 0) for a in range(6))
        return left, right
    return 5, 5


def _block_shrink(k: int, dilations: tuple, f: int) -> tuple[int, int]:
    """Total (left, right) row shrink of one AMP block's chain."""
    al, ar = _aa_extra(f)
    left = right = 0
    for d in dilations:
        s1 = _conv_shifts(k, d, d * (k - 1) // 2, f)
        s2 = _conv_shifts(k, 1, (k - 1) // 2, f)
        left += al - min(s1) + al - min(s2)
        right += ar + max(s1) + ar + max(s2)
    return left, right


def _stage_plan(kernel_sizes, dilation_sizes, f: int):
    """Static per-stage plan: per block, per dilation iteration the packed
    weight/bias/activation offsets and the conv row shifts."""
    blocks = []
    w_off = b_idx = a_idx = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        iters = []
        for d in dils:
            s1 = _conv_shifts(k, d, d * (k - 1) // 2, f)
            s2 = _conv_shifts(k, 1, (k - 1) // 2, f)
            iters.append(
                (w_off, s1, b_idx, a_idx, w_off + len(s1), s2, b_idx + 1, a_idx + 1)
            )
            w_off += len(s1) + len(s2)
            b_idx += 2
            a_idx += 2
        blocks.append(tuple(iters))
    return tuple(blocks)


# ---------------------------------------------------------------------------
# Folded-weight preparation (host side, under jit; trivial FLOPs)
# ---------------------------------------------------------------------------


def _fold_conv_weight(p: dict, k: int, d: int, pad: int, f: int, c: int, dtype):
    """(Q, f*c, f*c) stacked matmul weights + (f*c,) folded fp32 bias."""
    from vocoder_tpu import nn

    w = nn.weight_norm_weight(p)  # (k, c, c)
    if f == 1:
        wf = w
    else:
        idx, mask, _, _ = nn._fold_index(k, f, pad, d)
        wf = w[jnp.asarray(idx)] * jnp.asarray(mask)[..., None, None]  # (Q, f, f, c, c)
        wf = jnp.transpose(wf, (0, 1, 3, 2, 4)).reshape(idx.shape[0], f * c, f * c)
    bias = jnp.tile(p["b"], f) if "b" in p else jnp.zeros((f * c,), w.dtype)
    return wf.astype(dtype), bias.astype(jnp.float32)


def _fold_ab(act: dict, f: int, logscale: bool):
    """(2, 2fc)-lane alpha/beta: tiled over the fold AND the two polyphase
    branches (the mm FIR path computes snake on the combined [se | so] lanes;
    the f == 1 tap path slices the first fc lanes)."""
    alpha = act["alpha"]
    beta = act.get("beta", act["alpha"])
    if logscale:
        alpha, beta = jnp.exp(alpha), jnp.exp(beta)
    return jnp.stack([jnp.tile(alpha, 2 * f), jnp.tile(beta, 2 * f)]).astype(jnp.float32)


def _fir_weights(f: int, c: int, dtype):
    """Global folded FIR matmul weights shared by every aa-snake at fold f:

    w_up (Q_up, fc, 2fc): both polyphase branches in one matmul — lanes
    [0, fc) = 2*se (the snake's input gain folded into the taps), [fc, 2fc)
    = 2*so.  w_dn (Q_dn, 2fc, fc): the recombination z = g_o*se + g_e*so.
    """
    import numpy as np

    f_e, f_o, g_o, g_e = polyphase_taps()
    eye = np.eye(c, dtype=np.float64)
    w_up = np.zeros((6, c, 2 * c))
    w_up[:, :, :c] = 2.0 * f_e[:, None, None] * eye
    w_up[:, :, c:] = 2.0 * f_o[:, None, None] * eye
    w_dn = np.zeros((6, 2 * c, c))
    w_dn[:, :c, :] = g_o[:, None, None] * eye
    w_dn[:, c:, :] = g_e[:, None, None] * eye

    def fold(w, pad):
        from vocoder_tpu import nn

        k, cin, cout = w.shape
        if f == 1:
            return jnp.asarray(w, dtype)
        idx, mask, _, _ = nn._fold_index(k, f, pad, 1)
        wf = jnp.asarray(w, jnp.float32)[jnp.asarray(idx)] * jnp.asarray(mask)[..., None, None]
        wf = jnp.transpose(wf, (0, 1, 3, 2, 4)).reshape(idx.shape[0], f * cin, f * cout)
        return wf.astype(dtype)

    # Fold phases live on the MINOR side of each lane block: the folded array
    # is (..., r*C) with time phase major — but the [se|so] branch split is on
    # the CHANNEL-BLOCK level, so fold each branch half separately and concat.
    if f == 1:
        return fold(w_up, 5), fold(w_dn, 0)
    up_e = fold(w_up[:, :, :c], 5)  # (Q, fc, fc)
    up_o = fold(w_up[:, :, c:], 5)
    dn_e = fold(w_dn[:, :c, :], 0)
    dn_o = fold(w_dn[:, c:, :], 0)
    return (
        jnp.concatenate([up_e, up_o], axis=2),  # (Q, fc, 2fc): [se | so]
        jnp.concatenate([dn_e, dn_o], axis=1),  # (Q, 2fc, fc)
    )


def _stage_consts(block_params, kernel_sizes, dilation_sizes, f, c, logscale, dtype):
    ws, bs, abs_ = [], [], []
    for p, k, dils in zip(block_params, kernel_sizes, dilation_sizes):
        acts1 = p["activations"][::2]
        acts2 = p["activations"][1::2]
        for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], acts1, acts2, dils):
            w1, bias1 = _fold_conv_weight(c1, k, d, d * (k - 1) // 2, f, c, dtype)
            w2, bias2 = _fold_conv_weight(c2, k, 1, (k - 1) // 2, f, c, dtype)
            ws += [w1, w2]
            bs += [bias1, bias2]
            abs_ += [_fold_ab(a1, f, logscale), _fold_ab(a2, f, logscale)]
    return jnp.concatenate(ws, 0), jnp.stack(bs), jnp.stack(abs_)


# ---------------------------------------------------------------------------
# Kernel ops: (array, base) pairs — arr[0] is absolute window row `base`
# ---------------------------------------------------------------------------


def _tap_off(v, rolls, delta: int, rows: int, phys0: int, f: int, c: int):
    """Folded view of sample shift `delta` for `rows` outputs whose first
    output reads around physical row `phys0` (aa_snake._tap, re-based)."""
    d, e = delta // f, delta % f
    r0 = phys0 + d
    if e == 0:
        return v[r0 : r0 + rows, :]
    w = rolls[e]
    l = v.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, l), 1)
    return jnp.where(lane < l - e * c, w[r0 : r0 + rows, :], w[r0 + 1 : r0 + 1 + rows, :])


def _aa_apply(arr, base: int, ab, f: int, c: int, taps, wup_ref, wdn_ref, mm_dtype):
    """Interior aa-snake over the maximal valid region; returns (f32, base2).

    f > 1, "mm" (default): both FIRs run as folded (L, 2L)/(2L, L) matmuls on
    the MXU and the snake runs once on the combined [se | so] lanes.  Won
    pre-poly-sin when the VPU was sin-saturated; costs ~41 ms of
    structural-zero matmuls at MXU roofline across the f > 1 stages (b16).
    f > 1, "shuffle": taps as lane-rolled selects + FMAs — the true 6-tap
    math on the VPU, near-zero MXU FLOPs (see FIR_BACKEND).
    f == 1: taps are pure row-shifted FMAs (no lane phases), kept on the VPU.
    """
    l = f * c
    if f > 1 and fir_backend(f) == "mm":
        up_shifts, dn_shifts = _fir_shifts(f)
        y, yb = _mm_taps(arr, base, wup_ref, 0, up_shifts, mm_dtype)
        y = snake(y, ab[0:1, :], ab[1:2, :])  # the 2x gain is folded into w_up
        z, zb = _mm_taps(y, yb, wdn_ref, 0, dn_shifts, mm_dtype)
        return z, zb

    f_e, f_o, g_o, g_e = taps
    if f > 1:
        al, ar = _aa_extra(f)
        n = arr.shape[0]
        alpha = ab[0:1, :l]
        beta = ab[1:2, :l]
        r1 = n - al
        in_deltas = [j - 5 for j in range(6)]
        rolls = _lane_rolls(arr, f, c, in_deltas)
        se = so = None
        for j in range(6):
            v = _tap_off(arr, rolls, j - 5, r1, al, f, c)
            se = v * f_e[j] if se is None else se + v * f_e[j]
            so = v * f_o[j] if so is None else so + v * f_o[j]
        se = snake(2.0 * se, alpha, beta)
        so = snake(2.0 * so, alpha, beta)
        rz = r1 - ar
        out_deltas = list(range(6))
        se_rolls = _lane_rolls(se, f, c, out_deltas)
        so_rolls = _lane_rolls(so, f, c, out_deltas)
        z = None
        for a in range(6):
            t = _tap_off(se, se_rolls, a, rz, 0, f, c) * g_o[a] + _tap_off(
                so, so_rolls, a, rz, 0, f, c
            ) * g_e[a]
            z = t if z is None else z + t
        return z, base + al
    alpha = ab[0:1, :l]
    beta = ab[1:2, :l]
    n = arr.shape[0]
    al, ar = 5, 5

    # Branches: se/so[u] = snake(2 * sum_j arr[u - 5 + j] * taps[j]), valid
    # for u (physical) in [al, n).
    r1 = n - al
    se = so = None
    for j in range(6):
        v = arr[al + j - 5 : al + j - 5 + r1, :]
        se = v * f_e[j] if se is None else se + v * f_e[j]
        so = v * f_o[j] if so is None else so + v * f_o[j]
    se = snake(2.0 * se, alpha, beta)
    so = snake(2.0 * so, alpha, beta)

    # Recombination: z[t] = sum_a g_o[a]*se[t+a] + g_e[a]*so[t+a].
    rz = r1 - ar
    z = None
    for a in range(6):
        t = se[a : a + rz, :] * g_o[a] + so[a : a + rz, :] * g_e[a]
        z = t if z is None else z + t
    return z, base + al


def _mm_taps(arr, base: int, w_ref, w_off: int, shifts, mm_dtype):
    """Row-shifted matmul chain without bias: out[t] = sum_q arr[t+q] @ W_q."""
    n = arr.shape[0]
    smin, smax = min(shifts), max(shifts)
    rows = n - (smax - smin)
    acc = None
    v_in = arr.astype(mm_dtype)
    for qi, q in enumerate(shifts):
        v = v_in[q - smin : q - smin + rows, :]
        t = jax.lax.dot_general(
            v,
            w_ref[w_off + qi],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    return acc, base - smin


def _conv_apply(arr, base: int, w_ref, w_off: int, shifts, bias, mm_dtype):
    """Row-shifted matmul conv: out[t] = sum_q arr_abs[t + q] @ W_q + bias."""
    n = arr.shape[0]
    smin, smax = min(shifts), max(shifts)
    rows = n - (smax - smin)
    acc = None
    v_in = arr.astype(mm_dtype)
    for qi, q in enumerate(shifts):
        v = v_in[q - smin : q - smin + rows, :]
        t = jax.lax.dot_general(
            v,
            w_ref[w_off + qi],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    return acc + bias[None, :], base - smin


def _kernel(
    x_hbm, wc_ref, bias_ref, ab_ref, *rest,
    q_tile, halo_l, halo_r, f, c, q_total, taps, blocks, mm_dtype
):
    """Grid (B, n_tiles); double-buffered halo DMA; whole AMP stage per tile.

    rest = (wup_ref, wdn_ref, o_ref, x_vmem, sem) for folded "mm" stages;
    the f == 1 and "shuffle" FIRs are FMA/shuffle chains with no weights."""
    if f > 1 and fir_backend(f) == "mm":
        wup_ref, wdn_ref, o_ref, x_vmem, sem = rest
    else:
        wup_ref = wdn_ref = None
        o_ref, x_vmem, sem = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    win = q_tile + halo_l + halo_r
    g = i * n_j + j
    slot = jax.lax.rem(g, 2)
    nxt = 1 - slot

    def start_row(jj):
        # q_tile/halos are multiples of 8 so clip endpoints stay 8-aligned.
        return pl.multiple_of(jnp.clip(jj * q_tile - halo_l, 0, q_total - win), 8)

    def dma(ii, jj, s):
        return pltpu.make_async_copy(
            x_hbm.at[ii, pl.ds(start_row(jj), win), :], x_vmem.at[s], sem.at[s]
        )

    @pl.when(g == 0)
    def _():
        dma(i, j, slot).start()

    last = j + 1 == n_j
    nxt_i = jnp.where(last, i + 1, i)
    nxt_j = jnp.where(last, 0, j + 1)

    @pl.when(g + 1 < n_i * n_j)
    def _():
        dma(nxt_i, nxt_j, nxt).start()

    dma(i, j, slot).wait()
    # Re-align the clamped window: row halo_l == nominal row j*q_tile.  Only
    # first/last tiles shift; the wrapped garbage corresponds to rows outside
    # [0, Q), reaching only the edge outputs the wrapper splices over.
    shift = j * q_tile - halo_l - start_row(j)
    x = pltpu.roll(
        x_vmem[slot].astype(jnp.float32), jax.lax.rem(win - shift, win), axis=0
    )

    out_acc = None
    for iters in blocks:
        arr, base = x, 0
        for (w1, s1, b1, a1, w2, s2, b2, a2) in iters:
            t, tb = _aa_apply(arr, base, ab_ref[a1], f, c, taps, wup_ref, wdn_ref, mm_dtype)
            t, tb = _conv_apply(t, tb, wc_ref, w1, s1, bias_ref[b1], mm_dtype)
            t, tb = _aa_apply(t, tb, ab_ref[a2], f, c, taps, wup_ref, wdn_ref, mm_dtype)
            t, tb = _conv_apply(t, tb, wc_ref, w2, s2, bias_ref[b2], mm_dtype)
            arr = arr[tb - base : tb - base + t.shape[0], :] + t
            base = tb
        assert base <= halo_l and base + arr.shape[0] >= halo_l + q_tile, (
            "halo under-sized for block chain",
            base,
            arr.shape,
            halo_l,
            q_tile,
        )
        contrib = arr[halo_l - base : halo_l - base + q_tile, :]
        out_acc = contrib if out_acc is None else out_acc + contrib
    o_ref[:] = (out_acc * (1.0 / len(blocks))).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


def _max_tile() -> int:
    """Tile-row cap (VOCODER_AMP_TILE).  Larger tiles amortise the halo
    recompute (96/96 rows at f=1, 56/56 at f=2 — 19%/11% of a 1024-row
    tile).  r5 measured curve at b16 (kernel requests a 100 MiB scoped-vmem
    budget; the 16 MiB default OOM'd 2048 by 384K): 1024 = 112.9 ms,
    2048 = 105.8, 4096 = 102.5 — 4096 is the default; shorter inputs fall
    back automatically via _pick_tile."""
    import os

    v = int(os.environ.get("VOCODER_AMP_TILE", "4096"))
    if v not in (512, 1024, 2048, 4096):
        raise ValueError(f"VOCODER_AMP_TILE={v} not in (512, 1024, 2048, 4096)")
    return v


def _pick_tile(q: int, halo: int) -> int | None:
    cap = _max_tile()
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32):
        if cand > cap:
            continue
        if q % cand == 0 and q // cand >= 2 and q >= cand + halo:
            return cand
    return None


def _halos(kernel_sizes, dilation_sizes, f: int) -> tuple[int, int]:
    ls, rs = zip(*[_block_shrink(k, d, f) for k, d in zip(kernel_sizes, dilation_sizes)])
    return _round8(max(ls)), _round8(max(rs))


def amp_stage_supported(
    xf: jnp.ndarray, kernel_sizes, dilation_sizes, fold: int, interpret: bool = False
) -> str | None:
    """None when unsupported; "stage" for one all-blocks kernel (L == 128);
    "block" for one kernel per block (L == 256 — all three blocks' folded
    conv weights exceed VMEM together, one block's fit).

    "block" is OPT-IN (VOCODER_AMP_WIDE=fused): measured 118.6 vs 113.5 ms
    b16 whole-generator with the C=256 stage on XLA (BENCH.md r4) — three
    kernel launches re-reading x plus 8.7 MB of VMEM weights lose to XLA's
    dense convs on the one stage that was never elementwise-bound."""
    import os

    b, q, l = xf.shape
    if not interpret and jax.default_backend() == "cpu":
        return None
    if l == 256 and os.environ.get("VOCODER_AMP_WIDE", "xla") != "fused" and not interpret:
        return None
    if l not in (128, 256) or l % fold:
        return None
    c = l // fold
    if c % 8 != 0 and fold > 1:
        return None
    halo_l, halo_r = _halos(kernel_sizes, dilation_sizes, fold)
    if _pick_tile(q, halo_l + halo_r) is None:
        return None
    return "stage" if l == 128 else "block"


def amp_stage_fused(
    block_params: list,
    xf: jnp.ndarray,
    kernel_sizes: tuple,
    dilation_sizes: tuple,
    logscale: bool,
    fold: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-AMP-stage fused forward on a time-folded (B, Q, 128) array.

    Drop-in for mean_k(_amp_apply(block_k, xf, ...)) at inference; the edge
    rows within the chain receptive field of each sequence end are recomputed
    with the XLA oracle on short windows and spliced in.
    """
    b, q, l = xf.shape
    f = fold
    c = l // f
    taps = tuple(tuple(float(v) for v in t) for t in polyphase_taps())

    halo_l, halo_r = _halos(kernel_sizes, dilation_sizes, f)
    q_tile = _pick_tile(q, halo_l + halo_r)
    assert q_tile is not None, "caller must check amp_stage_supported"

    blocks = _stage_plan(kernel_sizes, dilation_sizes, f)
    mm_dtype = xf.dtype
    wc, bias, ab = _stage_consts(
        block_params, kernel_sizes, dilation_sizes, f, c, logscale, mm_dtype
    )
    inputs = [xf, wc, bias, ab]
    if f > 1 and fir_backend(f) == "mm":
        w_up, w_dn = _fir_weights(f, c, mm_dtype)
        inputs += [w_up, w_dn]

    kernel = functools.partial(
        _kernel,
        q_tile=q_tile,
        halo_l=halo_l,
        halo_r=halo_r,
        f=f,
        c=c,
        q_total=q,
        taps=taps,
        blocks=blocks,
        mm_dtype=mm_dtype,
    )
    win = q_tile + halo_l + halo_r
    z = pl.pallas_call(
        kernel,
        grid=(b, q // q_tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]  # x in HBM; manual halo DMA
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs[1:]],
        # VMEM inputs: packed conv weights, folded fp32 biases, pre-exp'ed
        # alpha/beta, and (folded stages only) the FIR (Q,L,2L)/(Q,2L,L)
        # matmul weights.
        out_specs=pl.BlockSpec(
            (None, q_tile, l), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, q, l), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, win, l), xf.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # Default scoped-vmem limit is 16 MiB; the 2048-row tiles need ~16.4
        # (measured OOM by 384K, r4i) and 4096 more.  v5e has 128 MiB VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    # Edge splice: recompute the contaminated rows with the XLA stage on
    # windows that include the true sequence edge.
    import types

    from vocoder_tpu.models.bigvgan import _amp_apply

    cfg = types.SimpleNamespace(snake_logscale=logscale, checkpointing=False)
    e_l, e_r = halo_l, halo_r
    w_l = min(q, e_l + halo_l + halo_r)
    w_r = min(q, e_r + halo_l + halo_r)
    n_k = len(kernel_sizes)

    def oracle(v):
        outs = [
            _amp_apply(
                block_params[kb], v, kernel_sizes[kb], dilation_sizes[kb], cfg, False, f, None
            )
            for kb in range(n_k)
        ]
        return sum(outs) / n_k

    left = oracle(xf[:, :w_l, :])[:, :e_l, :]
    right = oracle(xf[:, q - w_r :, :])[:, w_r - e_r :, :]
    z = z.at[:, :e_l, :].set(left)
    z = z.at[:, q - e_r :, :].set(right)
    return z
