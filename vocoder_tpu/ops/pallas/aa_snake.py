"""Fused anti-aliased Snake activation — Pallas TPU kernel.

BigVGAN's hot op (SURVEY.md §7 names it the hardest kernel in the project):
the reference lowers every Snake activation as upsample-2x FIR -> snake ->
downsample-2x FIR (alias_free_torch, bigvgan.py:226-233), i.e. three ops with
HBM round-trips of the 2x-rate intermediate.  This kernel computes the whole
composition in one VMEM pass and never materialises the 2x signal:

With the 12-tap Kaiser-sinc filter f (shared by up and down at ratio 2):
    y[2t]   = 2 * sum_{j<6} x[t-3+j] * f[11-2j]      (even polyphase branch)
    y[2t+1] = 2 * sum_{j<6} x[t-2+j] * f[10-2j]      (odd polyphase branch)
    z[t]    = sum_{a<6} f[2a+1]*snake(y[2(t-2+a)]) + f[2a]*snake(y[2(t-3+a)+1])

Per output tile: two 6-tap FIRs + snake + one 12-tap recombination, all as
static sublane shifts over VMEM-resident arrays; per-channel alpha/beta ride
the lane dim.  Each tile reads an x halo of 5 samples per side via manual DMA
from HBM (overlapping windows, which BlockSpec alone cannot express).

Sequence-edge semantics: the unfused pipeline edge-replicates BOTH x (before
up) and y (before down).  The kernel reproduces x-replication by pre-padding;
y-replication affects only the outer 3 output samples, which `fused_aa_snake`
recomputes with the unfused ops and splices in — bit-exact end to end
(verified against the alias_free_torch oracle in tests/test_pallas_aa_snake.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vocoder_tpu.ops.antialias import downsample1d, kaiser_sinc_filter1d, upsample1d

# The math needs x in [t0-5, t0+T+5]; Mosaic requires HBM DMA slice lengths
# aligned to the 8-sublane tiling, so the halo is widened to 8 per side
# (window = t_tile + 16) and the branch formulas index with a +3 base offset.
_HALO_L = 8
_HALO_R = 8
_EDGE = 4  # output samples per side recomputed unfused (>= 3 affected)
_EDGE_WIN = 32  # input window for the edge recomputation


def snake(x, alpha, beta):
    """x + (1/(beta+eps)) * sin^2(alpha*x); alpha/beta pre-exp'ed if logscale."""
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


def _kernel(x_hbm, ab_ref, o_ref, x_vmem, sem, *, t_tile, c, f_e, f_o, g_e, g_o):
    """Double-buffered: each program waits on its own slot's DMA (started by
    the previous program) and prefetches the next tile's window into the other
    slot, overlapping the halo load with compute."""
    i = pl.program_id(0)  # batch
    j = pl.program_id(1)  # time tile
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    win = t_tile + _HALO_L + _HALO_R
    g = i * n_j + j  # linear program index -> consistent slot parity everywhere
    slot = jax.lax.rem(g, 2)
    nxt = 1 - slot

    def dma(ii, jj, s):
        return pltpu.make_async_copy(
            x_hbm.at[ii, pl.ds(jj * t_tile, win), :], x_vmem.at[s], sem.at[s]
        )

    @pl.when(g == 0)
    def _():
        dma(i, j, slot).start()

    # Prefetch the next program's window (wrapping to the next batch row).
    last = j + 1 == n_j
    nxt_i = jnp.where(last, i + 1, i)
    nxt_j = jnp.where(last, 0, j + 1)

    @pl.when(g + 1 < n_i * n_j)
    def _():
        dma(nxt_i, nxt_j, nxt).start()

    dma(i, j, slot).wait()
    # Compute in f32: Mosaic has no bf16 sin, and the snake nonlinearity
    # benefits from the precision anyway; cast back at the store.
    x = x_vmem[slot].astype(jnp.float32)
    alpha = ab_ref[0:1, :].astype(jnp.float32)
    beta = ab_ref[1:2, :].astype(jnp.float32)

    # Even branch: se_local[u] = snake(2 * sum_j x[u+3+j] * f[11-2j]),
    # u in [0, t_tile+6)  (x_local[m] == x[t0-8+m], se_local[u] == se[t0-2+u])
    se = x[3 : 3 + t_tile + 6, :] * f_e[0]
    for j_ in range(1, 6):
        se = se + x[3 + j_ : 3 + j_ + t_tile + 6, :] * f_e[j_]
    se = snake(2.0 * se, alpha, beta)

    # Odd branch: so_local[v] = snake(2 * sum_j x[v+3+j] * f[10-2j]),
    # v in [0, t_tile+5)  (so_local[v] == so[t0-3+v]; same +3 base offset)
    so = x[3 : 3 + t_tile + 5, :] * f_o[0]
    for j_ in range(1, 6):
        so = so + x[3 + j_ : 3 + j_ + t_tile + 5, :] * f_o[j_]
    so = snake(2.0 * so, alpha, beta)

    # Recombine: z[t] = sum_a g[2a+1]*se[t+a] + g[2a]*so[t+a]
    z = se[0:t_tile, :] * g_o[0] + so[0:t_tile, :] * g_e[0]
    for a in range(1, 6):
        z = z + se[a : a + t_tile, :] * g_o[a] + so[a : a + t_tile, :] * g_e[a]
    o_ref[:] = z.astype(o_ref.dtype)


def _interior(x, ab, t_tile: int, interpret: bool):
    b, t, c = x.shape
    f = kaiser_sinc_filter1d(0.25, 0.3, 12)  # cutoff 0.5/2, half_width 0.6/2
    f_e = tuple(float(f[11 - 2 * j]) for j in range(6))
    f_o = tuple(float(f[10 - 2 * j]) for j in range(6))
    g_o = tuple(float(f[2 * a + 1]) for a in range(6))
    g_e = tuple(float(f[2 * a]) for a in range(6))

    xp = jnp.pad(x, ((0, 0), (_HALO_L, _HALO_R), (0, 0)), mode="edge")
    kernel = functools.partial(
        _kernel, t_tile=t_tile, c=c, f_e=f_e, f_o=f_o, g_e=g_e, g_o=g_o
    )
    return pl.pallas_call(
        kernel,
        grid=(b, t // t_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (2, C) alpha/beta
        ],
        out_specs=pl.BlockSpec((None, t_tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, t_tile + _HALO_L + _HALO_R, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, ab)


def _unfused(x, alpha2d, beta2d):
    return downsample1d(snake(upsample1d(x, 2), alpha2d, beta2d), 2)


def _pick_tile(t: int) -> int | None:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if t % cand == 0:
            return cand
    return None


def fused_aa_snake(
    x: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    logscale: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for downsample1d(snake(upsample1d(x, 2)), 2) on (B, T, C)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    alpha2d = alpha[None, :]
    beta2d = beta[None, :]

    t = x.shape[1]
    c = x.shape[2]
    t_tile = _pick_tile(t)
    # Mosaic HBM slices need 128-lane alignment: run the kernel for C >= 128,
    # zero-pad 64 <= C < 128 up to 128 (still a bandwidth win), and fall back
    # to the XLA composition for narrower stages where padding would cost
    # more than the fusion saves.
    if t_tile is None or t < 2 * _EDGE_WIN or (c % 128 != 0 and c < 64):
        return _unfused(x, alpha2d, beta2d)

    pad_c = (-c) % 128
    if pad_c:
        x_k = jnp.pad(x, ((0, 0), (0, 0), (0, pad_c)))
        alpha_k = jnp.pad(alpha, (0, pad_c))
        beta_k = jnp.pad(beta, (0, pad_c), constant_values=1.0)  # avoid 1/eps blowup on pad lanes
    else:
        x_k, alpha_k, beta_k = x, alpha, beta

    ab = jnp.stack([alpha_k, beta_k]).astype(x.dtype)
    z = _interior(x_k, ab, t_tile, interpret)
    if pad_c:
        z = z[:, :, :c]

    # Exact edges: the unfused path on a short window reproduces the global
    # edge-replication; interior contamination stays > _EDGE samples away.
    # In-place scatter (no full-tensor concatenate copy).
    left = _unfused(x[:, :_EDGE_WIN, :], alpha2d, beta2d)[:, :_EDGE, :]
    right = _unfused(x[:, -_EDGE_WIN:, :], alpha2d, beta2d)[:, -_EDGE:, :]
    z = z.at[:, :_EDGE, :].set(left)
    z = z.at[:, t - _EDGE :, :].set(right)
    return z
