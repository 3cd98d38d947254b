"""LSGAN adversarial + feature-matching losses.

Capability parity with the inlined losses of /root/reference/fish_vocoder/
models/gan.py:139-232: generator adv = sum over score items of mean((1-s)^2);
feature matching = sum of L1 over all feature-map pairs; discriminator =
sum over score items of mean((s_real-1)^2) + mean(s_fake^2).

"Score items" mirrors quirk Q3 exactly: MPD yields a LIST of per-period score
arrays, MRD yields one concatenated (B, D) ARRAY whose rows are iterated by
the reference's `for score in scores` loop — so for arrays we sum per-row
means (== B * overall mean).
"""

from __future__ import annotations

import jax.numpy as jnp


def _score_items(scores):
    if isinstance(scores, (list, tuple)):
        return list(scores)
    # 2-D array: iterate rows like torch's tensor iteration (gan.py:148,203).
    return [scores[i] for i in range(scores.shape[0])]


def generator_adversarial_loss(score_fakes) -> jnp.ndarray:
    loss = 0.0
    for s in _score_items(score_fakes):
        loss = loss + jnp.mean(jnp.square(1.0 - s))
    return loss


def feature_matching_loss(feat_real, feat_fake) -> jnp.ndarray:
    loss = 0.0
    for fr_list, ff_list in zip(feat_real, feat_fake):
        for fr, ff in zip(fr_list, ff_list):
            loss = loss + jnp.mean(jnp.abs(fr - ff))
    return loss


def discriminator_loss(score_reals, score_fakes) -> jnp.ndarray:
    loss = 0.0
    for sr, sf in zip(_score_items(score_reals), _score_items(score_fakes)):
        loss = loss + jnp.mean(jnp.square(sr - 1.0)) + jnp.mean(jnp.square(sf))
    return loss
