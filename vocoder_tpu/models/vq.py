"""Vector quantisation with EMA codebooks (encodec-style), pure XLA.

TPU-native equivalent of the `encodec` VectorQuantization /
ResidualVectorQuantization used by VQVAEModel (models/vae.py:2,66-78;
SURVEY.md §2.9): EMA k-means codebook updates, straight-through estimator,
commitment loss.  Residual quantisation stacks the quantisers with
lax-friendly Python loops (static count).

Codebook state is NON-gradient state (the torch codebooks are buffers, not
parameters): `apply` returns the updated state alongside the outputs, and the
train step threads it through TrainState.extra — nothing here touches the
optimizer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VQConfig:
    dim: int
    codebook_size: int
    num_quantizers: int = 1
    decay: float = 0.99
    eps: float = 1e-5
    commitment_weight: float = 1.0


def init(key, cfg: VQConfig) -> dict:
    """Uniform random codebook init (kmeans_init=False, vae.py:71,77)."""
    keys = jax.random.split(key, cfg.num_quantizers)
    layers = []
    for k in keys:
        embed = jax.random.normal(k, (cfg.codebook_size, cfg.dim))
        layers.append(
            {
                "embed": embed,
                "embed_avg": embed.copy(),
                "cluster_size": jnp.zeros((cfg.codebook_size,)),
            }
        )
    return {"layers": layers}


def _quantize_one(state: dict, x: jnp.ndarray, cfg: VQConfig, training: bool):
    """x: (N, D) flattened -> (quantized (N, D), codes (N,), new_state)."""
    embed = jax.lax.stop_gradient(state["embed"])  # codebook learns via EMA only
    dist = (
        jnp.sum(jnp.square(x), axis=1, keepdims=True)
        - 2.0 * x @ embed.T
        + jnp.sum(jnp.square(embed), axis=1)[None, :]
    )
    codes = jnp.argmin(dist, axis=1)
    quantized = embed[codes]

    if training:
        onehot = jax.nn.one_hot(codes, cfg.codebook_size, dtype=x.dtype)
        counts = jnp.sum(onehot, axis=0)
        embed_sums = onehot.T @ jax.lax.stop_gradient(x)
        cluster_size = state["cluster_size"] * cfg.decay + counts * (1 - cfg.decay)
        embed_avg = state["embed_avg"] * cfg.decay + embed_sums * (1 - cfg.decay)
        n = jnp.sum(cluster_size)
        smoothed = (cluster_size + cfg.eps) / (n + cfg.codebook_size * cfg.eps) * n
        new_embed = embed_avg / smoothed[:, None]
        new_state = {"embed": new_embed, "embed_avg": embed_avg, "cluster_size": cluster_size}
    else:
        new_state = state
    return quantized, codes, new_state


def apply(state: dict, x: jnp.ndarray, cfg: VQConfig, training: bool = False):
    """x: (B, D, T) latent -> (quantized (B, D, T), codes (Q, B, T), loss, new_state).

    Residual scheme: each quantiser codes the residual of the previous; the
    decoded latent is the sum.  Loss = mean commitment MSE across quantisers.
    """
    b, d, t = x.shape
    flat = jnp.transpose(x, (0, 2, 1)).reshape(-1, d)

    residual = flat
    quantized_total = jnp.zeros_like(flat)
    codes_all = []
    losses = []
    new_layers = []
    for layer in state["layers"]:
        q, codes, new_layer = _quantize_one(layer, residual, cfg, training)
        # Straight-through: gradient flows to the (residual) input.
        q_st = residual + jax.lax.stop_gradient(q - residual)
        losses.append(jnp.mean(jnp.square(jax.lax.stop_gradient(q) - residual)) * cfg.commitment_weight)
        quantized_total = quantized_total + q_st
        residual = residual - jax.lax.stop_gradient(q)
        codes_all.append(codes)
        new_layers.append(new_layer)

    quantized = jnp.transpose(quantized_total.reshape(b, t, d), (0, 2, 1))
    codes = jnp.stack(codes_all).reshape(len(codes_all), b, t)
    loss = jnp.mean(jnp.stack(losses))
    return quantized, codes, loss, {"layers": new_layers}


def from_codes(state: dict, codes: jnp.ndarray, cfg: VQConfig) -> jnp.ndarray:
    """codes (Q, B, T) -> latent (B, D, T); the codec decode path (unify.py:43-53)."""
    q, b, t = codes.shape
    total = jnp.zeros((b, t, cfg.dim))
    for i in range(q):
        total = total + state["layers"][i]["embed"][codes[i]]
    return jnp.transpose(total, (0, 2, 1))
