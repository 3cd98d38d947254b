"""Minimal functional NN layer library on parameter pytrees.

Design: models are pure functions over nested-dict parameter pytrees —
``init(key, cfg) -> params`` and ``apply(params, x, ...) -> y`` — which is the
idiomatic JAX shape for a fully jit-compiled GAN train step with two optax
chains (no framework object graph under jit; params thread explicitly, so
sharding annotations, weight-norm folding, and torch-checkpoint conversion are
plain tree transforms).

Activations are laid out channels-LAST (B, T, C): the channel dim maps onto
the TPU lane dimension (128) and convs lower as ('NHC','HIO','NHC'), the
MXU-friendly layout.  The reference keeps torch's (B, C, T); public model
entry points accept (B, C, T) features for drop-in compatibility and
transpose once at the boundary.

Weight norm follows torch.nn.utils.parametrizations.weight_norm(dim=0)
semantics exactly (needed for checkpoint parity with the reference, e.g.
fish_vocoder/modules/generators/hifigan.py:158,178,214): params store
``{"v", "g"}`` with ``g`` broadcast-shaped; the normalisation axes are the
axes where ``g`` has size 1, so folding (`fold_weight_norm`, the analogue of
remove_parametrizations at hifigan.py:251-257) is one generic tree transform.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

DEFAULT_PRECISION = lax.Precision.HIGHEST


def set_default_precision(p) -> None:
    """Set matmul/conv precision globally (HIGHEST for parity, DEFAULT for speed)."""
    global DEFAULT_PRECISION
    DEFAULT_PRECISION = p


# ---------------------------------------------------------------------------
# Initializers (torch-compatible defaults)
# ---------------------------------------------------------------------------


def kaiming_uniform(key, shape, fan_in: int):
    """torch's default conv/linear weight init: kaiming_uniform(a=sqrt(5))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def normal_init(key, shape, mean=0.0, std=0.01):
    """Reference init_weights (hifigan.py:15-18): normal(0, 0.01)."""
    return mean + std * jax.random.normal(key, shape, jnp.float32)


def trunc_normal_init(key, shape, std=0.02):
    """ConvNeXt init (convnext.py:201-204): trunc_normal(std=.02), +-2std."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def uniform_bias(key, shape, fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# Weight norm
# ---------------------------------------------------------------------------


def weight_norm_weight(p: Params) -> jnp.ndarray:
    """Materialise the effective weight from a {"v","g"} or {"w"} layer dict."""
    if "w" in p:
        return p["w"]
    v, g = p["v"], p["g"]
    axes = tuple(d for d in range(v.ndim) if g.shape[d] == 1)
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return v * (g / norm)


def wn_init(w: jnp.ndarray, g_axis: int) -> Params:
    """Wrap a weight in weight-norm params: g = ||w|| along all axes but g_axis."""
    axes = tuple(d for d in range(w.ndim) if d != g_axis)
    g_shape = tuple(1 if d != g_axis else w.shape[d] for d in range(w.ndim))
    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True)).reshape(g_shape)
    return {"v": w, "g": g}


def fold_weight_norm(params: Params) -> Params:
    """Recursively replace {"v","g"} with the folded {"w"} (inference mode).

    The analogue of the reference's remove_parametrizations
    (hifigan.py:251-257, test.py:41-42).
    """
    if isinstance(params, dict):
        if "v" in params and "g" in params:
            out = {k: v for k, v in params.items() if k not in ("v", "g")}
            out["w"] = weight_norm_weight(params)
            return out
        return {k: fold_weight_norm(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fold_weight_norm(v) for v in params)
    return params


def fold_weight_norm_specs(specs):
    """Apply fold_weight_norm's structural change to a PartitionSpec tree:
    {"v", "g"} collapses to {"w"} carrying v's spec (the folded weight
    w = v * g/||v|| has v's shape, and every tp_specs builder gives v the
    materialised-weight sharding).  Keeps a param_specs tree usable for
    weight-norm-folded inference params (cli/infer.py --model-parallel)."""
    if isinstance(specs, dict):
        if "v" in specs and "g" in specs:
            out = {k: v for k, v in specs.items() if k not in ("v", "g")}
            out["w"] = specs["v"]
            return out
        return {k: fold_weight_norm_specs(v) for k, v in specs.items()}
    if isinstance(specs, (list, tuple)):
        return type(specs)(fold_weight_norm_specs(v) for v in specs)
    return specs


# ---------------------------------------------------------------------------
# Conv layers.  Canonical weight layouts:
#   conv1d            : (K, I/groups, O)          [HIO]
#   conv_transpose1d  : (K, I, O) where w[k,i,o] = w_torch[i,o,K-1-k]
#   conv2d            : (kH, kW, I, O)            [HWIO]
# g_axis: conv1d/conv2d -> output axis (last); conv_transpose1d -> axis 1 (I),
# mirroring torch weight_norm(dim=0) on each torch layout.
# ---------------------------------------------------------------------------


def conv1d_init(key, in_ch, out_ch, kernel_size, *, groups=1, bias=True, weight_norm=False, init="torch"):
    kw, kb = jax.random.split(key)
    shape = (kernel_size, in_ch // groups, out_ch)
    fan_in = (in_ch // groups) * kernel_size
    if init == "torch":
        w = kaiming_uniform(kw, shape, fan_in)
    elif init == "normal":
        w = normal_init(kw, shape)
    elif init == "trunc_normal":
        w = trunc_normal_init(kw, shape)
    else:
        raise ValueError(init)
    p = wn_init(w, g_axis=2) if weight_norm else {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,)) if init == "trunc_normal" else uniform_bias(kb, (out_ch,), fan_in)
    return p


def conv1d(p: Params, x: jnp.ndarray, *, stride=1, padding=0, dilation=1, groups=1, precision=None, fold=1) -> jnp.ndarray:
    """x: (B, T, C_in) -> (B, T', C_out); torch Conv1d semantics.

    ``fold=r`` (stride-1, non-grouped, "same"-padded convs only) runs the conv
    space-to-depth folded: r consecutive time steps become channels, so a
    C=16 conv becomes a 16r-channel conv that fills the 128-lane MXU — the
    key throughput lever for the small-channel late stages of HiFiGAN/BigVGAN
    upsampling stacks (numerically identical; see fold_conv1d_weight).
    """
    if fold > 1 and stride == 1 and groups == 1 and x.shape[1] % fold == 0:
        return _conv1d_folded(p, x, padding=padding, dilation=dilation, fold=fold, precision=precision)
    w = weight_norm_weight(p)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)] if isinstance(padding, int) else [padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        precision=precision or DEFAULT_PRECISION,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"]
    return y


@functools.lru_cache(maxsize=None)
def _fold_index(k: int, r: int, padding: int, dilation: int):
    """Static (idx, mask, qmin) for space-to-depth conv folding.

    y[t*r + j, d] = sum_{tau, c} x[t*r + j + dilation*tau - p, c] W[tau, c, d].
    Writing the input offset as q*r + i, each folded tap q couples input lane i
    to output lane j through original tap tau = q*r + i - j + p (when it
    exists); everything else is a structural zero.
    """
    import numpy as _np

    p = padding
    qmin = -((p + r - 1) // r)
    qmax = ((r - 1) + dilation * (k - 1) - p) // r
    q_count = qmax - qmin + 1
    idx = _np.zeros((q_count, r, r), _np.int32)
    mask = _np.zeros((q_count, r, r), _np.float32)
    for qi, q in enumerate(range(qmin, qmax + 1)):
        for i in range(r):
            for j in range(r):
                tau_num = q * r + i - j + p
                if tau_num % dilation == 0:
                    tau = tau_num // dilation
                    if 0 <= tau < k:
                        idx[qi, i, j] = tau
                        mask[qi, i, j] = 1.0
    return idx, mask, qmin, qmax


def conv1d_folded_io(p: Params, xf: jnp.ndarray, *, padding: int, dilation: int = 1, fold: int, precision=None) -> jnp.ndarray:
    """Stride-1 "same"-padded dilated conv directly ON a time-folded array.

    xf: (B, T/r, r*C_in) with time step t = q*r + i living in channel block i
    -> (B, T/r, r*C_out), same convention.  Unlike conv1d(fold=...), the input
    and output stay folded, so a chain of convs + elementwise ops (an MRF
    resblock) keeps the lane dimension dense at any channel count instead of
    paying the 128-lane tile padding of a C<128 minor dim around every op.
    """
    w = weight_norm_weight(p)
    k, cin, cout = w.shape
    r = fold
    idx, mask, qmin, qmax = _fold_index(k, r, padding, dilation)
    # Folded weight: (Q, r*cin, r*cout).
    wf = w[jnp.asarray(idx)] * jnp.asarray(mask)[..., None, None]  # (Q, r, r, cin, cout)
    wf = jnp.transpose(wf, (0, 1, 3, 2, 4)).reshape(idx.shape[0], r * cin, r * cout).astype(xf.dtype)
    y = lax.conv_general_dilated(
        xf,
        wf,
        window_strides=(1,),
        padding=[(-qmin, qmax)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision or DEFAULT_PRECISION,
        preferred_element_type=xf.dtype,
    )  # (B, T/r, r*cout)
    if "b" in p:
        y = y + jnp.tile(p["b"], r)
    return y


def _conv1d_folded(p: Params, x: jnp.ndarray, *, padding: int, dilation: int, fold: int, precision):
    b, t, cin = x.shape
    xf = x.reshape(b, t // fold, fold * cin)
    y = conv1d_folded_io(p, xf, padding=padding, dilation=dilation, fold=fold, precision=precision)
    return y.reshape(b, t, y.shape[2] // fold)


@functools.lru_cache(maxsize=None)
def _fold_index_transpose(k: int, u: int, padding: int, r: int):
    """Selection tensor for a stride-u transposed conv on r-folded input.

    y[t_out, co] = sum_tau x[(t_out + tau - (k-1-p)) / u, ci] * w[tau, ci, co]
    over taps where u divides the numerator (the lhs-dilated correlation of
    conv_transpose1d).  With t_out = q*(r*u) + j the contributing input row is
    q*r + Q*r + i, giving one folded tap Q coupling input phase i to output
    phase j through original tap tau.
    """
    import numpy as _np

    ru = r * u
    taps = []
    for j in range(ru):
        for tau in range(k):
            s = j + tau - (k - 1 - padding)
            if s % u:
                continue
            ip = s // u
            taps.append((ip // r, ip % r, j, tau))
    qmin = min(t[0] for t in taps)
    qmax = max(t[0] for t in taps)
    sel = _np.zeros((qmax - qmin + 1, r, ru, k), _np.float32)
    for q, i, j, tau in taps:
        sel[q - qmin, i, j, tau] = 1.0
    return sel, qmin, qmax


def conv_transpose1d_folded_io(p: Params, xf: jnp.ndarray, *, stride: int, padding: int, fold: int, precision=None) -> jnp.ndarray:
    """conv_transpose1d directly on a time-folded array.

    xf: (B, T/r, r*C_in) -> (B, T/r, (r*stride)*C_out): the output fold factor
    grows by the upsample rate, so as channels halve while the rate doubles the
    folded channel width r*C stays constant across an upsampling stack — the
    whole generator tail runs lane-dense with no reshapes between stages.
    Requires the "same-length" padding (k - stride even, padding=(k-stride)//2)
    used by HiFiGAN/BigVGAN so the output is exactly stride*T samples.
    """
    w = weight_norm_weight(p)
    k, cin, cout = w.shape
    r = fold
    # The folded output is exactly stride*T samples only under the models'
    # "same-length" padding; any other padding would return a plausible shape
    # with wrong values, so fail fast instead.
    assert padding == (k - stride) // 2 and (k - stride) % 2 == 0, (k, stride, padding)
    sel, qmin, qmax = _fold_index_transpose(k, stride, padding, r)
    wf = jnp.einsum("qijt,tco->qicjo", jnp.asarray(sel, w.dtype), w)
    wf = wf.reshape(sel.shape[0], r * cin, r * stride * cout).astype(xf.dtype)
    y = lax.conv_general_dilated(
        xf,
        wf,
        window_strides=(1,),
        padding=[(-qmin, qmax)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision or DEFAULT_PRECISION,
        preferred_element_type=xf.dtype,
    )  # (B, T/r, r*stride*cout)
    if "b" in p:
        y = y + jnp.tile(p["b"], r * stride)
    return y


def length_mask(x: jnp.ndarray, lens) -> jnp.ndarray:
    """Zero positions >= per-item length on a (B, T, C) array (no-op for None).

    The masked-batching primitive: re-applied after every time-mixing op, a
    right-zero-padded batch computes exactly what each item computes alone.
    """
    if lens is None:
        return x
    m = jnp.arange(x.shape[1])[None, :] < lens[:, None]
    return x * m[..., None].astype(x.dtype)


def tail_fold_factor(c: int, t: int, active: bool) -> int:
    """Time-fold factor entering an upsampling stage (1 = stay unfolded).

    Shared by the HiFiGAN/BigVGAN folded tails; `active` carries each model's
    policy (HiFiGAN folds only when training — its inference forward is
    conv-bound; BigVGAN folds whenever on TPU — its anti-aliased activations
    dominate both modes).
    """
    if not active or c >= 128:
        return 1
    r = 128 // c
    while r > 1 and t % r:
        r //= 2
    return r


def folded_stack_upsample(p_up: Params, x: jnp.ndarray, *, fold: int, stride: int, kernel: int, c_out: int, active: bool):
    """One upsample step of a possibly-folded stack -> (x, fold', t_cur).

    In the folded regime the transposed conv grows the fold factor in place
    (fold' = fold*stride, so fold*C stays constant as channels halve); an odd
    kernel-stride difference exits the folded domain for that stage, and an
    unfolded stage whose output channels drop below 128 enters it.
    """
    b = x.shape[0]
    pad = (kernel - stride) // 2
    if fold > 1 and (kernel - stride) % 2 == 0:
        x = conv_transpose1d_folded_io(p_up, x, stride=stride, padding=pad, fold=fold)
        fold *= stride
    else:
        if fold > 1:
            x = x.reshape(b, -1, x.shape[2] // fold)
            fold = 1
        x = conv_transpose1d(p_up, x, stride=stride, padding=pad)
    t_cur = x.shape[1] * fold
    if fold == 1:
        fold = tail_fold_factor(c_out, t_cur, active)
        if fold > 1:
            x = x.reshape(b, t_cur // fold, fold * c_out)
    return x, fold, t_cur


def conv_transpose1d_init(key, in_ch, out_ch, kernel_size, *, bias=True, weight_norm=False, init="torch"):
    kw, kb = jax.random.split(key)
    shape = (kernel_size, in_ch, out_ch)
    fan_in = out_ch * kernel_size  # torch ConvTranspose1d fan_in uses weight.size(1)*k
    if init == "torch":
        w = kaiming_uniform(kw, shape, fan_in)
    elif init == "normal":
        w = normal_init(kw, shape)
    else:
        raise ValueError(init)
    p = wn_init(w, g_axis=1) if weight_norm else {"w": w}
    if bias:
        p["b"] = uniform_bias(kb, (out_ch,), fan_in)
    return p


def conv_transpose1d(p: Params, x: jnp.ndarray, *, stride, padding=0, precision=None) -> jnp.ndarray:
    """x: (B, T, C_in) -> (B, (T-1)*stride - 2*padding + K, C_out).

    torch ConvTranspose1d semantics via an input-dilated conv: dilate the
    input by `stride`, then run a VALID conv with (K-1-padding) pads.
    """
    w = weight_norm_weight(p)
    k = w.shape[0]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision or DEFAULT_PRECISION,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"]
    return y


# Measured on TPU v5e: XLA's conv lowering is NOT lane-limited for these
# shapes, so folding's extra structural-zero FLOPs lose (377 -> 337 audio-s/s
# on HiFiGAN).  The exact folded path stays available behind this flag for
# shapes/backends where it wins.
ENABLE_CONV_FOLDING = False


@functools.lru_cache(maxsize=None)
def _choose_fold_impl(k: int, dilation: int, padding: int, channels: int, t: int) -> int:
    best_r, best_gain = 1, 1.49
    r = 2
    while r * channels <= 128:
        if t % r == 0:
            _, _, qmin, qmax = _fold_index(k, r, padding, dilation)
            gain = k / (qmax - qmin + 1)
            if gain > best_gain:
                best_r, best_gain = r, gain
        r *= 2
    return best_r


def choose_fold(k: int, dilation: int, padding: int, channels: int, t: int) -> int:
    """Space-to-depth fold factor for a small-channel conv (1 = disabled)."""
    if not ENABLE_CONV_FOLDING:
        return 1
    return _choose_fold_impl(k, dilation, padding, channels, t)


def conv2d_init(key, in_ch, out_ch, kernel_size, *, bias=True, weight_norm=False, init="torch"):
    kh, kw_ = kernel_size if isinstance(kernel_size, tuple) else (kernel_size, kernel_size)
    k1, k2 = jax.random.split(key)
    shape = (kh, kw_, in_ch, out_ch)
    fan_in = in_ch * kh * kw_
    if init == "torch":
        w = kaiming_uniform(k1, shape, fan_in)
    elif init == "normal":
        w = normal_init(k1, shape)
    else:
        raise ValueError(init)
    p = wn_init(w, g_axis=3) if weight_norm else {"w": w}
    if bias:
        p["b"] = uniform_bias(k2, (out_ch,), fan_in)
    return p


def conv2d(p: Params, x: jnp.ndarray, *, stride=(1, 1), padding=(0, 0), precision=None) -> jnp.ndarray:
    """x: (B, H, W, C_in) -> (B, H', W', C_out); torch Conv2d semantics."""
    w = weight_norm_weight(p)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision or DEFAULT_PRECISION,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Dense / norm layers
# ---------------------------------------------------------------------------


def linear_init(key, in_f, out_f, *, bias=True, init="torch"):
    k1, k2 = jax.random.split(key)
    if init == "torch":
        w = kaiming_uniform(k1, (in_f, out_f), in_f)
    elif init == "trunc_normal":
        w = trunc_normal_init(k1, (in_f, out_f))
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_f,)) if init == "trunc_normal" else uniform_bias(k2, (out_f,), in_f)
    return p


def linear(p: Params, x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    y = jnp.matmul(x, p["w"], precision=precision or DEFAULT_PRECISION)
    if "b" in p:
        y = y + p["b"]
    return y


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p: Params, x: jnp.ndarray, *, eps=1e-6) -> jnp.ndarray:
    """LayerNorm over the last (channel) axis; matches convnext.py:47-74.

    (The reference's channels_first branch is the same math on (B,C,T); with
    our channels-last layout both collapse to normalising the last axis.)
    """
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    x = (x - mu) / jnp.sqrt(var + eps)
    return x * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# Activations (exact torch parity)
# ---------------------------------------------------------------------------


def silu(x):
    return x * jax.nn.sigmoid(x)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def gelu(x):
    # torch nn.GELU() default is the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def drop_path(key, x, drop_prob: float, training: bool):
    """Stochastic depth per sample (convnext.py:7-29 semantics)."""
    if drop_prob == 0.0 or not training:
        return x
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape).astype(x.dtype)
    return x * mask / keep


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
