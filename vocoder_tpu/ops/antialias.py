"""Anti-aliased (alias-free) up/down sampling for periodic activations.

TPU-native equivalent of the `alias_free_torch` package used by the
reference's BigVGAN (modules/generators/bigvgan.py:9,226-233,335-337):
Kaiser-windowed sinc low-pass FIRs around each Snake activation —
2x polyphase upsample -> activation -> 2x decimating low-pass.

All filters are depthwise convs in channels-last layout; XLA fuses the
upsample/act/downsample stack per resblock layer.
"""

from __future__ import annotations

import functools
import math
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """LPF design matching alias_free_torch.filter.kaiser_sinc_filter1d."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f = f / f.sum()
    return f.astype(np.float32)


def _depthwise_kernel(filt: np.ndarray, channels: int, dtype) -> jnp.ndarray:
    # (K,) -> (K, 1, C) HIO depthwise kernel (filter shared across channels).
    return jnp.broadcast_to(jnp.asarray(filt, dtype)[:, None, None], (filt.shape[0], 1, channels))


def upsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T*ratio, C); alias_free_torch.resample.UpSample1d."""
    b, t, c = x.shape
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    w = _depthwise_kernel(filt[::-1].copy(), c, x.dtype)  # flip for transposed conv

    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = ratio * lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample1d(x: jnp.ndarray, ratio: int = 2, kernel_size: int | None = None) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T//ratio, C); alias_free_torch.resample.DownSample1d."""
    b, t, c = x.shape
    kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    w = _depthwise_kernel(filt, c, x.dtype)

    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(ratio,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


# Snake transcendental backend.  The r4 fused-kernel profile attributed the
# BigVGAN inference residue to the VPU sin chain itself (not HBM/layout):
# libm-grade jnp.sin pays a wide-range Payne-Hanek-style reduction + a long
# polynomial per element.  "poly" evaluates sin^2(w) = (1 - cos(2w))/2 with a
# cheap round-based range reduction (exact for |2w| < 2^23 — snake arguments
# are O(1..100)) and a degree-6-in-r^2 minimax cosine (max error 3.6e-8 over
# a period — invisible at the bf16 output precision and far below the fp32
# parity-test tolerances).  ~13 fusable VPU ops; benefits the XLA path and
# the Pallas kernels equally.  "exact" keeps jnp.sin.
SNAKE_SIN = _os.environ.get("VOCODER_SNAKE_SIN", "poly")
if SNAKE_SIN not in ("poly", "exact"):
    raise ValueError(f"VOCODER_SNAKE_SIN={SNAKE_SIN!r}: expected 'poly' or 'exact'")

_TWO_PI = 6.283185307179586
_INV_TWO_PI = 1.0 / _TWO_PI
# Cody-Waite split of 2*pi: k*HI and k*MID are exact in fp32 for k < 2^12
# (both constants carry few mantissa bits), so the reduction r = u - k*2pi
# loses no precision up to |u| ~ 2.5e4 (plain single-constant reduction
# degraded to ~2e-5 by |u| ~ 600).
_TP_HI = 6.28125
_TP_MID = 0.0019350051879882812
_TP_LO = 3.0199159795074593e-07
# cos(r) = sum_i c_i (r^2)^i on r in [-pi, pi]; Chebyshev-fitted, |err| <= 3.6e-8.
_COS_COEF = (
    0.9999999922907286,
    -0.4999999177267109,
    0.04166652436474753,
    -0.0013887970410899468,
    2.4773424196945306e-05,
    -2.71133732450103e-07,
    1.7369133647437146e-09,
)
# sin(r) = r * sum_i s_i (r^2)^i on r in [-pi, pi]; |err| <= 7.7e-9.
_SIN_COEF = (
    0.9999999994768398,
    -0.16666666108562112,
    0.008333323685091395,
    -0.0001984064754254522,
    2.7538258044539417e-06,
    -2.4752169156660884e-08,
    1.3697464704976747e-10,
)


def sin_sq(w):
    """sin^2(w), elementwise (fp32): poly backend or exact jnp.sin."""
    if SNAKE_SIN == "exact":
        return jnp.square(jnp.sin(w))
    u = 2.0 * w
    k = jnp.round(u * _INV_TWO_PI)
    r = ((u - k * _TP_HI) - k * _TP_MID) - k * _TP_LO  # r in [-pi, pi]
    r2 = r * r
    cos = _COS_COEF[-1]
    for c_i in _COS_COEF[-2::-1]:
        cos = cos * r2 + c_i
    return 0.5 - 0.5 * cos


def fast_sin(w):
    """sin(w), elementwise (fp32): poly backend (odd poly after the same
    Cody-Waite reduction) or jnp.sin."""
    if SNAKE_SIN == "exact":
        return jnp.sin(w)
    k = jnp.round(w * _INV_TWO_PI)
    r = ((w - k * _TP_HI) - k * _TP_MID) - k * _TP_LO  # r in [-pi, pi]
    r2 = r * r
    s = _SIN_COEF[-1]
    for c_i in _SIN_COEF[-2::-1]:
        s = s * r2 + c_i
    return r * s


def _snake_f32(v, a, bgain):
    return v + (1.0 / (bgain + 1e-9)) * sin_sq(v * a)


@functools.lru_cache(maxsize=None)
def polyphase_taps():
    """(f_e, f_o, g_o, g_e): the ratio-2 Kaiser-sinc filter's polyphase taps.

    With f the 12-tap filter shared by up- and downsample at ratio 2:
        se[u] = snake(2 * sum_j x[u-5+j] * f_e[j])      f_e[j] = f[11-2j]
        so[u] = snake(2 * sum_j x[u-5+j] * f_o[j])      f_o[j] = f[10-2j]
        z[t]  = sum_a g_o[a]*se[t+a] + g_e[a]*so[t+a]   g_o[a]=f[2a+1], g_e[a]=f[2a]
    """
    f = kaiser_sinc_filter1d(0.25, 0.3, 12).astype(np.float64)
    f_e = np.asarray([f[11 - 2 * j] for j in range(6)])
    f_o = np.asarray([f[10 - 2 * j] for j in range(6)])
    g_o = np.asarray([f[2 * a_ + 1] for a_ in range(6)])
    g_e = np.asarray([f[2 * a_] for a_ in range(6)])
    return f_e, f_o, g_o, g_e


# Depthwise-FIR lowering (both numerically equivalent; the taps are shared
# across channels, so the "conv" is really 6 shifted scalar FMAs):
#   "conv"  — feature_group_count=C depthwise conv_general_dilated
#             (default).
#   "shift" — static slices + FMAs.  Hypothesis from the r3 train profile
#             (depthwise convs relayout the C>=128 stages to batch-
#             interleaved {2,0,1}, 57% of the BigVGAN step in transpose
#             copies) — MEASURED WORSE on v5e: train 218.8 vs 208.3 ms,
#             poly4 inference 453.2 vs 210.8 ms.  In the folded layout the
#             per-phase lane-block selects are cross-lane shuffles, exactly
#             the permutation the MXU does for free in the matmul form; kept
#             as an A/B backend and a recorded negative result (BENCH.md).
import os as _os

DWCONV_BACKEND = _os.environ.get("VOCODER_DWCONV", "conv")  # "conv" | "shift" | "dense"
if DWCONV_BACKEND not in ("conv", "shift", "dense"):
    raise ValueError(
        f"VOCODER_DWCONV={DWCONV_BACKEND!r} is not a known backend; "
        "expected one of 'conv' (default), 'shift', 'dense'"
    )


def _dwconv_shift(v, taps):
    """y[t] = sum_j taps[j] * v[t + j] (VALID) as shifted FMAs on (B, T, C)."""
    t_out = v.shape[1] - len(taps) + 1
    acc = None
    for j, f in enumerate(np.asarray(taps, np.float32).tolist()):
        term = f * v[:, j : j + t_out, :].astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc.astype(v.dtype)


def _dwconv(v, taps):
    """Depthwise 6-tap VALID correlation on (B, T, C); see DWCONV_BACKEND."""
    if DWCONV_BACKEND == "shift":
        return _dwconv_shift(v, taps)
    if DWCONV_BACKEND == "dense":
        # taps ⊗ I as a DENSE (k, C, C) conv: the MXU pays the structural
        # zeros (~1.5 kFLOP/element — trivial at 134 TFLOP/s) and XLA keeps
        # the one layout it uses for every other dense conv, instead of the
        # batch-interleaved relayout it picks for feature_group_count=C
        # (57% of the r3 bigvgan train profile in transpose copies).  The
        # autodiff transpose also stays dense — no tiny-group pathology.
        # bf16 inputs take one MXU pass (taps cast to bf16, same as the
        # folded path); fp32 inputs keep HIGHEST for oracle exactness.
        c = v.shape[-1]
        w = jnp.asarray(np.asarray(taps, np.float32)[:, None, None] * np.eye(c, dtype=np.float32), v.dtype)
        prec = lax.Precision.HIGHEST if v.dtype == jnp.float32 else lax.Precision.DEFAULT
        return lax.conv_general_dilated(
            v, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"), precision=prec,
        )
    c = v.shape[-1]
    w = jnp.broadcast_to(jnp.asarray(taps, v.dtype)[:, None, None], (len(taps), 1, c))
    return lax.conv_general_dilated(
        v, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


@jax.custom_vjp
def aa_snake_core(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Interior polyphase aa-snake on (B, T, C); alpha/beta pre-exp'ed (C,).

    Matches downsample1d(snake(upsample1d(x, 2)), 2) except at the outer
    ~4 samples per side (where the unfused pipeline edge-replicates the
    2x-rate intermediate) — callers splice those via `_apply_edges`.

    Forward is the fused-branch form ("v1"): both polyphase branches ride ONE
    depthwise conv with channel multiplier 2 (group g -> out channels
    [2g, 2g+1]), one snake over 2C interleaved channels, one depthwise conv
    over 2C, and an explicit pair-sum (577 -> 520 ms BigVGAN b16 vs four
    separate depthwise convs; a grouped 2->1 contraction instead of the
    pair-sum measures 1084 ms).  Backward is hand-written below: XLA's
    autodiff transposes the multiplier-2 conv into exactly the tiny-group
    contraction pathology (3x slower training step measured).
    """
    b, t, c = x.shape
    f_e, f_o, g_o, g_e = polyphase_taps()
    a2c = jnp.repeat(alpha, 2)[None, :].astype(jnp.float32)
    b2c = jnp.repeat(beta, 2)[None, :].astype(jnp.float32)

    xp = jnp.pad(x, ((0, 0), (5, 6), (0, 0)), mode="edge")
    w_in = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(f_e, x.dtype)[:, None], (6, c)),
            jnp.broadcast_to(jnp.asarray(f_o, x.dtype)[:, None], (6, c)),
        ],
        axis=2,
    ).reshape(6, 1, 2 * c)  # interleaved [f_e, f_o] per source channel
    y = lax.conv_general_dilated(
        xp, w_in, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )  # (B, T+6, 2C) interleaved [se, so] per source channel
    y = _snake_f32(2.0 * y.astype(jnp.float32), a2c, b2c).astype(x.dtype)
    w_out = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(g_o, x.dtype)[:, None], (6, c)),
            jnp.broadcast_to(jnp.asarray(g_e, x.dtype)[:, None], (6, c)),
        ],
        axis=2,
    ).reshape(6, 1, 2 * c)  # interleaved [g_o, g_e] per source channel
    z2 = lax.conv_general_dilated(
        y[:, : t + 5, :], w_out, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=2 * c,
        precision=lax.Precision.HIGHEST,
    )  # (B, T, 2C)
    return z2.reshape(b, t, c, 2).sum(-1)


def _core_fwd(x, alpha, beta):
    return aa_snake_core(x, alpha, beta), (x, alpha, beta)


def aa_snake_core_bwd(x, alpha, beta, ct):
    """Hand-derived VJP of the interior polyphase aa-snake.

    Every conv is a plain depthwise correlation with (flipped) taps — the
    form XLA lowers well — and the snake derivative is analytic:
        d/dv [v + (1/b) sin^2(a v)] = 1 + (a/b) sin(2 a v)
        d/da = (v/b) sin(2 a v),   d/db = -(1/b^2) sin^2(a v)
    Pre-activations are recomputed from x (cheap 6-tap convs) instead of
    saved, so residuals are just the primals.  Used by BOTH the XLA forward
    above and the Pallas kernel (ops/pallas/aa_snake.py).
    """
    b, t, c = x.shape
    f_e, f_o, g_o, g_e = polyphase_taps()
    a2 = alpha[None, :].astype(jnp.float32)
    b2 = beta[None, :].astype(jnp.float32)
    ct32 = ct.astype(jnp.float32)

    # Recompute pre-activations ye/yo (length T+5: se/so index t+a <= T+4).
    xp = jnp.pad(x, ((0, 0), (5, 6), (0, 0)), mode="edge")
    ye = 2.0 * _dwconv(xp[:, : t + 10, :], f_e).astype(jnp.float32)  # (B, T+5, C)
    yo = 2.0 * _dwconv(xp[:, : t + 10, :], f_o).astype(jnp.float32)

    # dse[u] = sum_a g_o[a] ct[u-a], u in [0, T+5): zero-padded correlation
    # with flipped taps.
    ctp = jnp.pad(ct32, ((0, 0), (5, 5), (0, 0)))
    dse = _dwconv(ctp, tuple(g_o[::-1]))  # (B, T+5, C)
    dso = _dwconv(ctp, tuple(g_e[::-1]))

    inv_b = 1.0 / (b2 + 1e-9)
    s2e = fast_sin(2.0 * a2 * ye)
    s2o = fast_sin(2.0 * a2 * yo)
    dye = dse * (1.0 + a2 * inv_b * s2e)
    dyo = dso * (1.0 + a2 * inv_b * s2o)

    # Parameter grads (per channel, summed over batch+time).
    d_alpha = jnp.sum(inv_b * (dse * s2e * ye + dso * s2o * yo), axis=(0, 1))
    # sin^2(a v) via 0.5*(1 - cos(2 a v)).
    se_sq = 0.5 * (1.0 - jnp.cos(2.0 * a2 * ye))
    so_sq = 0.5 * (1.0 - jnp.cos(2.0 * a2 * yo))
    d_beta = -jnp.sum(jnp.square(inv_b) * (dse * se_sq + dso * so_sq), axis=(0, 1))

    # dxp[m] = 2 sum_j f_e[j] dye[m-j] + f_o[j] dyo[m-j]; then fold the
    # edge-replicated pad positions back onto x[0] / x[T-1].
    dyep = jnp.pad(dye, ((0, 0), (5, 6), (0, 0)))  # (B, T+16, C)
    dyop = jnp.pad(dyo, ((0, 0), (5, 6), (0, 0)))
    dxp = 2.0 * (_dwconv(dyep, tuple(f_e[::-1])) + _dwconv(dyop, tuple(f_o[::-1])))  # (B, T+11, C)
    dx = dxp[:, 5 : t + 5, :]
    dx = dx.at[:, 0, :].add(jnp.sum(dxp[:, :5, :], axis=1))
    dx = dx.at[:, t - 1, :].add(jnp.sum(dxp[:, t + 5 :, :], axis=1))

    return dx.astype(x.dtype), d_alpha.astype(alpha.dtype), d_beta.astype(beta.dtype)


def _core_bwd(res, ct):
    x, alpha, beta = res
    return aa_snake_core_bwd(x, alpha, beta, ct)


aa_snake_core.defvjp(_core_fwd, _core_bwd)


def apply_aa_edges(x, z, alpha, beta, edge: int = 4, window: int = 32):
    """Splice unfused-recomputed edges into an interior aa-snake result.

    The interior polyphase formula differs from the reference composition at
    the outer ~3 samples per side (the unfused pipeline edge-replicates the
    2x-rate intermediate before the down-FIR); recomputing `edge` samples
    from a short window reproduces the global result exactly.  alpha/beta are
    pre-exp'ed (C,) arrays.
    """
    t = x.shape[1]
    a2 = alpha[None, :].astype(jnp.float32)
    b2 = beta[None, :].astype(jnp.float32)

    def unfused(v):
        return downsample1d(_snake_f32(upsample1d(v, 2).astype(jnp.float32), a2, b2).astype(v.dtype), 2)

    if t >= 2 * window:
        left = unfused(x[:, :window, :])[:, :edge, :]
        right = unfused(x[:, -window:, :])[:, -edge:, :]
        z = z.at[:, :edge, :].set(left)
        z = z.at[:, t - edge :, :].set(right)
    else:
        z = unfused(x)
    return z


def aa_snake_poly4(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool
) -> jnp.ndarray:
    """Polyphase aa-snake as FOUR plain depthwise convs, XLA autodiff.

    Same math as aa_snake_polyphase but with separate se/so branches (no
    channel-multiplier conv, no custom VJP): autodiff saves the
    pre-activations as residuals instead of recomputing them, which can win
    in training where the fused-branch forward's backward recompute adds six
    extra convs.
    """
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    t = x.shape[1]
    f_e, f_o, g_o, g_e = polyphase_taps()
    a2 = alpha[None, :].astype(jnp.float32)
    b2 = beta[None, :].astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (5, 6), (0, 0)), mode="edge")
    se = _snake_f32(2.0 * _dwconv(xp[:, : t + 10, :], tuple(f_e)).astype(jnp.float32), a2, b2).astype(x.dtype)
    so = _snake_f32(2.0 * _dwconv(xp[:, : t + 10, :], tuple(f_o)).astype(jnp.float32), a2, b2).astype(x.dtype)
    z = _dwconv(se, tuple(g_o)) + _dwconv(so, tuple(g_e))  # (B, T, C)
    return apply_aa_edges(x, z, alpha, beta)


def _dwconv_folded(vf: jnp.ndarray, taps, r: int, padding: int, c: int) -> jnp.ndarray:
    """Depthwise correlation y[t] = sum_tau taps[tau] * v[t + tau - padding]
    evaluated directly on a time-folded (B, T/r, r*C) array (zero padding).

    "conv" backend (the default; "dense" takes the same path here): expand
    the per-fold-phase tap matrix with a channel identity into a dense folded
    conv — heavy in structural zeros, but those are nearly free on the MXU
    and XLA keeps its one dense-conv layout (measured fastest, BENCH.md).

    "shift" backend: the taps are channel-shared scalars, so each output
    phase block j is a sum of k row-shifted, lane-block-selected FMAs — pure
    elementwise work that never materialises a folded weight nor pays
    structural-zero MXU FLOPs.  Measured WORSE on v5e (the lane-block selects
    are cross-lane shuffles the matmul form gets for free); kept for A/B.
    """
    from vocoder_tpu import nn

    if DWCONV_BACKEND == "shift":
        b, rows, rc = vf.shape
        k = len(taps)
        qmin = -((padding + r - 1) // r)
        qmax = ((r - 1) + (k - 1) - padding) // r
        vp = jnp.pad(vf, ((0, 0), (-qmin, qmax), (0, 0))).astype(jnp.float32)
        taps_f = [float(t) for t in np.asarray(taps, np.float64)]
        outs = []
        for j in range(r):
            acc = None
            for tau in range(k):
                s_off = j + tau - padding
                q = s_off // r  # python floor-div handles negatives
                i = s_off - q * r
                blk = vp[:, (q - qmin) : (q - qmin) + rows, i * c : (i + 1) * c]
                term = taps_f[tau] * blk
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.concatenate(outs, axis=-1).astype(vf.dtype)

    idx, mask, qmin, qmax = nn._fold_index(len(taps), r, padding, 1)
    tf = jnp.asarray(np.asarray(taps, np.float32)[idx] * mask, vf.dtype)  # (Q, r, r)
    wf = jnp.einsum("qij,cd->qicjd", tf, jnp.eye(c, dtype=vf.dtype)).reshape(idx.shape[0], r * c, r * c)
    return lax.conv_general_dilated(
        vf, wf, window_strides=(1,), padding=[(-qmin, qmax)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=lax.Precision.HIGHEST,
    )


def aa_snake_poly4_folded(
    xf: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool, fold: int
) -> jnp.ndarray:
    """aa_snake_poly4 on a time-folded (B, T/r, r*C) array, staying folded.

    Interior uses zero padding (not the pipeline's edge replication), which
    contaminates <= 5 output samples per side on top of the usual interior-
    formula edge difference — both are fixed by recomputing whole edge ROW
    blocks with the unfused composition on small unfolded windows and
    splicing them in, so the result equals unfold(aa_snake_poly4(fold(x))).
    """
    r = fold
    b, rows, rc = xf.shape
    c = rc // r
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    a_f = jnp.tile(alpha, r)[None, :].astype(jnp.float32)
    b_f = jnp.tile(beta, r)[None, :].astype(jnp.float32)
    f_e, f_o, g_o, g_e = polyphase_taps()

    pad_rows = -(-6 // r)  # se/so are needed out to sample T+4
    xe = jnp.pad(xf, ((0, 0), (0, pad_rows), (0, 0)))
    se = _snake_f32(2.0 * _dwconv_folded(xe, f_e, r, 5, c).astype(jnp.float32), a_f, b_f).astype(xf.dtype)
    so = _snake_f32(2.0 * _dwconv_folded(xe, f_o, r, 5, c).astype(jnp.float32), a_f, b_f).astype(xf.dtype)
    z = _dwconv_folded(se, g_o, r, 0, c) + _dwconv_folded(so, g_e, r, 0, c)
    z = z[:, :rows]

    # Edge rows recomputed unfused on unfolded windows (covers both the
    # zero-pad contamination, 5 samples, and the interior-formula edge
    # difference).
    er = -(-6 // r)
    win_rows = min(rows, max(4 * er, -(-32 // r)))
    a2 = alpha[None, :].astype(jnp.float32)
    b2 = beta[None, :].astype(jnp.float32)

    def unfused(v):
        return downsample1d(_snake_f32(upsample1d(v, 2).astype(jnp.float32), a2, b2).astype(v.dtype), 2)

    def unfold(v):
        return v.reshape(b, -1, r, c).reshape(b, -1, c)

    def refold(v, n_rows):
        return v.reshape(b, n_rows, r * c)

    if rows >= 2 * win_rows:
        left = unfused(unfold(xf[:, :win_rows]))[:, : er * r]
        right = unfused(unfold(xf[:, rows - win_rows :]))[:, -er * r :]
        z = z.at[:, :er].set(refold(left, er))
        z = z.at[:, rows - er :].set(refold(right, er))
    else:
        z = refold(unfused(unfold(xf)), rows)
    return z


def aa_snake_poly4_masked(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool, lengths: jnp.ndarray
) -> jnp.ndarray:
    """aa_snake_poly4 for a right-zero-padded variable-length batch.

    Per item the unfused pipeline edge-replicates ITS OWN last sample —
    interior to a padded array, where the batched interior formula sees zeros
    instead.  The interior therefore runs with plain zero padding, and each
    item's last EDGE samples are recomputed with the unfused composition on a
    32-sample window ENDING AT ITS LENGTH (vmapped dynamic slice/update), so
    row i equals aa_snake_poly4 of item i alone.  Requires lengths >= 32.
    """
    edge, window = 5, 32
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    t = x.shape[1]
    f_e, f_o, g_o, g_e = polyphase_taps()
    a2 = alpha[None, :].astype(jnp.float32)
    b2 = beta[None, :].astype(jnp.float32)
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)[..., None]
    x = x * mask

    # Interior with ZERO padding (contaminates <= 5 samples per side, all
    # inside the spliced edges).
    xp = jnp.pad(x, ((0, 0), (5, 6), (0, 0)))
    se = _snake_f32(2.0 * _dwconv(xp[:, : t + 10, :], tuple(f_e)).astype(jnp.float32), a2, b2).astype(x.dtype)
    so = _snake_f32(2.0 * _dwconv(xp[:, : t + 10, :], tuple(f_o)).astype(jnp.float32), a2, b2).astype(x.dtype)
    z = (_dwconv(se, tuple(g_o)) + _dwconv(so, tuple(g_e))) * mask

    def unfused(v):
        return downsample1d(_snake_f32(upsample1d(v, 2).astype(jnp.float32), a2, b2).astype(v.dtype), 2)

    # Left edges: every item starts at array position 0 (static).
    z = z.at[:, :edge].set(unfused(x[:, :window, :])[:, :edge])

    # Right edges: per item, at its own length (dynamic).
    def fix_right(zi, xi, li):
        start = jnp.clip(li - window, 0, t - window)
        win = jax.lax.dynamic_slice_in_dim(xi, start, window, axis=0)
        rep = unfused(win[None])[0, -edge:]
        return jax.lax.dynamic_update_slice_in_dim(zi, rep.astype(zi.dtype), li - edge, axis=0)

    z = jax.vmap(fix_right)(z, x, lengths)
    return z * mask


def aa_snake_polyphase(
    x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool
) -> jnp.ndarray:
    """Fused anti-aliased snake at 1x rate, pure XLA.

    Drop-in for downsample1d(snake(upsample1d(x, 2)), 2) on (B, T, C): the
    polyphase decomposition (see ops/pallas/aa_snake.py for the derivation)
    turns the up(2x) -> snake -> down(2x) pipeline into two 6-tap depthwise
    correlations at 1x rate, the snake nonlinearity on each branch, and two
    more 6-tap correlations — the 2x-rate intermediate never exists.  Edges
    are recomputed with the reference composition and spliced, so the result
    is numerically equivalent end to end.  Differentiable via the shared
    hand-written VJP (aa_snake_core_bwd).
    """
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    z = aa_snake_core(x, alpha, beta)
    return apply_aa_edges(x, z, alpha, beta)
