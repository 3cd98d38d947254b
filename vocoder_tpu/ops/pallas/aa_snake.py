"""Fused anti-aliased Snake activation — Pallas TPU kernel (v2).

BigVGAN's hot op (SURVEY.md §7 names it the hardest kernel in the project):
the reference lowers every Snake activation as upsample-2x FIR -> snake ->
downsample-2x FIR (alias_free_torch, bigvgan.py:226-233).  The XLA polyphase
path (ops/antialias.aa_snake_polyphase) already removes the 2x-rate
intermediate; this kernel additionally removes every intermediate HBM
round-trip: one pass reads x and writes z, with both polyphase branches, the
snake nonlinearity, and the recombination FIR all evaluated on VMEM tiles.

With the 12-tap Kaiser-sinc filter f (shared by up and down at ratio 2):
    se[u] = snake(2 * sum_{j<6} x[u-5+j] * f[11-2j])     (even branch)
    so[u] = snake(2 * sum_{j<6} x[u-5+j] * f[10-2j])     (odd branch)
    z[t]  = sum_{a<6} f[2a+1]*se[t+a] + f[2a]*so[t+a]

v2 over the round-1 kernel (which lost to the XLA polyphase, BENCH.md):
  * **Lane folding** for narrow stages: BigVGAN's widest (largest-T) stages
    run at C = 16..64 where a channels-last kernel wastes 2-8x of the 128-lane
    VPU.  Because C is the minor axis, (B, T, C) -> (B, T/f, f*C) with
    f = 128/C is a free reshape; a time shift of d*f+e becomes a pair of
    lane-slices from adjacent folded rows, so every FIR tap stays a full-width
    vector FMA at any C >= 16.
  * **No pre-pad copy**: the round-1 kernel edge-padded x with jnp.pad (a full
    extra HBM read+write per activation).  v2 DMAs clamped windows straight
    from the unpadded input and re-aligns with one dynamic sublane roll; the
    wrapped garbage lands exactly on samples outside [0, T), which only reach
    the EDGE outputs recomputed unfused and spliced by the wrapper.
  * Trainable: jax.custom_vjp whose backward is the (XLA) polyphase VJP.

Sequence-edge semantics: the unfused pipeline edge-replicates BOTH x (before
up) and y (before down); the outer 5 output samples differ from the pure
interior formula and are recomputed with the unfused ops and spliced —
matching the alias_free_torch oracle end to end
(tests/test_pallas_aa_snake.py).

STATUS: kept as the kernel-programming reference backend
(bigvgan.AA_BACKEND="pallas"), not the default.  The kernel beat every
UNFOLDED XLA form (422 vs 517 ms BigVGAN b16 inference), but it lane-folds
only inside the op — between ops the activations return to the C<128-minor
layout that XLA pads to the 128-lane tile, and the whole-pipeline folded
layout (models/bigvgan.py TAIL_FOLD + ops/antialias.aa_snake_poly4_folded)
removes that padding everywhere: 236 ms inference, and faster backward in
training (the kernel call also blocks XLA's fusion with the surrounding conv
gradients: 598 vs 480 ms/step).  See BENCH.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vocoder_tpu.ops.antialias import (
    aa_snake_core,
    aa_snake_core_bwd,
    apply_aa_edges,
    kaiser_sinc_filter1d,
)

_HALO = 8  # folded rows of halo per side (>= ceil(5/f) for every f)
_EDGE = 5  # output samples per side recomputed unfused (z[t], t<5, reads x[<0])
_EDGE_WIN = 32  # input window for the edge recomputation


def snake(x, alpha, beta):
    """x + (1/(beta+eps)) * sin^2(alpha*x); alpha/beta pre-exp'ed if logscale.

    Shares the antialias sin^2 backend (poly range-reduced cosine by default
    — Mosaic has no cheap sin either, and the r4 profile put the kernel's
    residue in the VPU transcendental chain)."""
    from vocoder_tpu.ops.antialias import sin_sq

    return x + (1.0 / (beta + 1e-9)) * sin_sq(x * alpha)


def _lane_rolls(v, f: int, c: int, deltas):
    """Pre-rotate `v` by -e*c lanes for every lane-phase e the taps need.

    Mosaic's tpu.concatenate requires matching operand offsets, so the folded
    shift view is built from whole-array lane rotations + a lane-index select
    instead of concatenating two lane slices.
    """
    es = sorted({d % f for d in deltas} - {0})
    l = v.shape[1]
    # roll(v, l - e*c)[:, lane] == v[:, (lane + e*c) % l]; pltpu.roll requires
    # a non-negative shift.
    return {e: pltpu.roll(v, l - e * c, axis=1) for e in es}


def _tap(v, rolls, delta: int, rows: int, base: int, f: int, c: int):
    """Folded view of time-shift `delta`: S[q, r*c+ch] = x[(q*f+r)+delta, ch].

    `v` holds folded rows with v[base] == the tile's first nominal row;
    returns `rows` folded rows.  delta = d*f + e maps lane block r to
    (row q+d, lanes (r+e)*c..) for r+e < f and to (row q+d+1,
    lanes (r+e-f)*c..) otherwise: both cases read lane (l+e*c) mod L of the
    pre-rotated array, from adjacent rows, selected by lane index.
    """
    d, e = delta // f, delta % f
    r0 = base + d
    if e == 0:
        return v[r0 : r0 + rows, :]
    w = rolls[e]
    l = v.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, l), 1)
    return jnp.where(lane < l - e * c, w[r0 : r0 + rows, :], w[r0 + 1 : r0 + 1 + rows, :])


def _kernel(
    x_hbm, ab_ref, o_ref, x_vmem, sem, *, q_tile, f, c, q_total, f_e, f_o, g_e, g_o
):
    """Grid (B, n_time_tiles); double-buffered halo DMA from HBM."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    win = q_tile + 2 * _HALO
    g = i * n_j + j
    slot = jax.lax.rem(g, 2)
    nxt = 1 - slot

    def start_row(jj):
        # q_tile and q_total are multiples of 8, _HALO == 8: every clip
        # endpoint is 8-aligned, but Mosaic cannot prove it — hint it.
        return pl.multiple_of(jnp.clip(jj * q_tile - _HALO, 0, q_total - win), 8)

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
    # Re-align the clamped window to nominal coordinates (v[_HALO] == row
    # j*q_tile): only the first/last tiles are shifted, and the garbage the
    # roll wraps into the halo corresponds exactly to rows outside [0, Q),
    # which reach only the _EDGE spliced outputs.
    shift = j * q_tile - _HALO - start_row(j)  # in [-_HALO, _HALO]
    # Compute in f32: Mosaic has no bf16 sin (nor bf16 dynamic rotate), and
    # the snake nonlinearity benefits from the precision; cast at the store.
    # pltpu.roll needs a non-negative shift: win - shift is congruent mod win.
    x = pltpu.roll(
        x_vmem[slot].astype(jnp.float32), jax.lax.rem(win - shift, win), axis=0
    )
    alpha = ab_ref[0:1, :].astype(jnp.float32)
    beta = ab_ref[1:2, :].astype(jnp.float32)

    extra = -(-5 // f)  # se/so rows beyond the tile needed by the recombination
    r1 = q_tile + extra

    # Branches: se/so[u] = snake(2 * sum_j x[u-5+j] * taps[j]), u in folded
    # rows [0, r1) relative to this tile.
    in_deltas = [j_ - 5 for j_ in range(6)]
    x_rolls = _lane_rolls(x, f, c, in_deltas)
    v = _tap(x, x_rolls, -5, r1, _HALO, f, c)
    se = v * f_e[0]
    so = v * f_o[0]
    for j_ in range(1, 6):
        v = _tap(x, x_rolls, j_ - 5, r1, _HALO, f, c)
        se = se + v * f_e[j_]
        so = so + v * f_o[j_]
    se = snake(2.0 * se, alpha, beta)
    so = snake(2.0 * so, alpha, beta)

    # Recombination: z[t] = sum_a g_o[a]*se[t+a] + g_e[a]*so[t+a].
    out_deltas = list(range(6))
    se_rolls = _lane_rolls(se, f, c, out_deltas)
    so_rolls = _lane_rolls(so, f, c, out_deltas)
    z = se[0:q_tile, :] * g_o[0] + so[0:q_tile, :] * g_e[0]
    for a in range(1, 6):
        z = z + _tap(se, se_rolls, a, q_tile, 0, f, c) * g_o[a]
        z = z + _tap(so, so_rolls, a, q_tile, 0, f, c) * g_e[a]
    o_ref[:] = z.astype(o_ref.dtype)


def _pick_tile(q: int) -> int | None:
    # q_tile multiple of 8 keeps DMA starts sublane-aligned; need >= 2 tiles
    # and q >= q_tile + 2*_HALO so window clamping stays in range.
    for cand in (512, 256, 128, 64, 32, 16):
        if q % cand == 0 and q // cand >= 2 and q >= cand + 2 * _HALO:
            return cand
    return None


def _interior(x, ab, q_tile: int, f: int, c: int, interpret: bool):
    b, q, l = x.shape
    filt = kaiser_sinc_filter1d(0.25, 0.3, 12)  # cutoff 0.5/2, half_width 0.6/2
    f_e = tuple(float(filt[11 - 2 * j]) for j in range(6))
    f_o = tuple(float(filt[10 - 2 * j]) for j in range(6))
    g_o = tuple(float(filt[2 * a + 1]) for a in range(6))
    g_e = tuple(float(filt[2 * a]) for a in range(6))

    kernel = functools.partial(
        _kernel,
        q_tile=q_tile,
        f=f,
        c=c,
        q_total=q,
        f_e=f_e,
        f_o=f_o,
        g_e=g_e,
        g_o=g_o,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, q // q_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (2, L) folded alpha/beta
        ],
        out_specs=pl.BlockSpec(
            (None, q_tile, l), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, q, l), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, q_tile + 2 * _HALO, l), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, ab)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core(x, alpha, beta, static):
    """Pallas interior aa-snake; same contract as antialias.aa_snake_core
    (alpha/beta pre-exp'ed; edges handled by the caller's splice).  `static`
    = (f, q_tile, interpret)."""
    f, q_tile, interpret = static
    b, t, c = x.shape
    xf = x.reshape(b, t // f, f * c)  # free: C is minor, row-major
    ab = jnp.stack([jnp.tile(alpha, f), jnp.tile(beta, f)]).astype(jnp.float32)
    return _interior(xf, ab, q_tile, f, c, interpret).reshape(b, t, c)


def _fused_fwd(x, alpha, beta, static):
    return _fused_core(x, alpha, beta, static), (x, alpha, beta)


def _fused_bwd(static, res, ct):
    # The kernel computes the same interior function as aa_snake_core, so it
    # shares the hand-written VJP (plain depthwise convs + analytic snake').
    x, alpha, beta = res
    return aa_snake_core_bwd(x, alpha, beta, ct)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_aa_snake(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    logscale: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for downsample1d(snake(upsample1d(x, 2)), 2) on (B, T, C)."""
    b, t, c = x.shape
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)

    f = 1 if c >= 128 else 128 // c
    supported = not (c % 8 != 0 or (c < 128 and 128 % c != 0) or t % f != 0)
    q_tile = _pick_tile(t // f) if supported else None
    if q_tile is None or t < 2 * _EDGE_WIN:
        z = aa_snake_core(x, alpha, beta)
        return apply_aa_edges(x, z, alpha, beta)

    z = _fused_core(x, alpha, beta, (f, q_tile, interpret))
    # The kernel's clamped-DMA garbage contaminates < _EDGE samples per side;
    # the splice recomputes them with the reference composition.
    return apply_aa_edges(x, z, alpha, beta, edge=_EDGE)
