"""Global-descriptor metric losses (jittable).

TPU-native equivalents of ``losses/pointnetvlad_loss.py``:
  - :func:`best_pos_distance`   (:9-15)
  - :func:`triplet_loss`        (:18-45) + wrapper (:48-50)
  - :func:`quadruplet_loss`     (:53-105)
  - :func:`hphn_quadruplet_loss`(:157-167)

All take ``(B, 1, D)`` query / other_neg, ``(B, P, D)`` positives and
``(B, N, D)`` negatives, exactly like the reference's tuple-batch
splits (train_place_recognition.py:166-168).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def best_pos_distance(query: jax.Array, pos_vecs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Min / max squared distance from query to its positives: ``(B,), (B,)``."""
    diff = jnp.sum((pos_vecs - query) ** 2, axis=2)        # (B, P)
    return jnp.min(diff, axis=1), jnp.max(diff, axis=1)


def _hinge_or_softplus(loss: jax.Array, soft_margin: bool) -> jax.Array:
    if soft_margin:
        return jnp.log1p(jnp.exp(jnp.minimum(loss, 88.0)))
    return jnp.maximum(loss, 0.0)


def _reduce(loss: jax.Array, lazy: bool, ignore_zero_loss: bool, sum_not_mean: bool = False) -> jax.Array:
    # loss: (B, N) per-negative hinge values.
    if lazy:
        per_query = jnp.max(loss, axis=1)
    elif sum_not_mean:
        per_query = jnp.sum(loss, axis=1)
    else:
        per_query = jnp.mean(loss, axis=1)
    if ignore_zero_loss:
        hard = (per_query > 1e-16).astype(loss.dtype)
        return jnp.sum(per_query) / (jnp.sum(hard) + 1e-16)
    return jnp.mean(per_query)


def triplet_loss(
    q_vec: jax.Array,
    pos_vecs: jax.Array,
    neg_vecs: jax.Array,
    margin: float,
    use_min: bool = False,
    lazy: bool = False,
    ignore_zero_loss: bool = False,
) -> jax.Array:
    min_pos, max_pos = best_pos_distance(q_vec, pos_vecs)
    positive = min_pos if use_min else max_pos
    neg_d = jnp.sum((neg_vecs - q_vec) ** 2, axis=2)       # (B, N)
    loss = jnp.maximum(margin + positive[:, None] - neg_d, 0.0)
    # NB: reference triplet uses sum over negatives in the non-lazy branch
    # (pointnetvlad_loss.py:38) where quadruplet uses mean (:77).
    return _reduce(loss, lazy, ignore_zero_loss, sum_not_mean=True)


def triplet_loss_wrapper(
    q_vec, pos_vecs, neg_vecs, other_neg, m1, m2,
    use_min=False, lazy=False, ignore_zero_loss=False, soft_margin=False,
):
    del other_neg, m2, soft_margin
    return triplet_loss(q_vec, pos_vecs, neg_vecs, m1, use_min, lazy, ignore_zero_loss)


def quadruplet_loss(
    q_vec: jax.Array,
    pos_vecs: jax.Array,
    neg_vecs: jax.Array,
    other_neg: jax.Array,
    m1: float,
    m2: float,
    use_min: bool = False,
    lazy: bool = False,
    ignore_zero_loss: bool = False,
    soft_margin: bool = False,
) -> jax.Array:
    min_pos, max_pos = best_pos_distance(q_vec, pos_vecs)
    positive = (min_pos if use_min else max_pos)[:, None]  # (B, 1)

    neg_d = jnp.sum((neg_vecs - q_vec) ** 2, axis=2)       # (B, N)
    first = _hinge_or_softplus(m1 + positive - neg_d, soft_margin)
    first = _reduce(first, lazy, ignore_zero_loss)

    other_d = jnp.sum((neg_vecs - other_neg) ** 2, axis=2) # (B, N)
    second = _hinge_or_softplus(m2 + positive - other_d, soft_margin)
    second = _reduce(second, lazy, ignore_zero_loss)
    return first + second


def hphn_quadruplet_loss(
    q_vec, pos_vecs, neg_vecs, other_neg, m1, m2,
    use_min=False, lazy=False, ignore_zero_loss=False, soft_margin=False,
) -> jax.Array:
    del m2, use_min, lazy, ignore_zero_loss, soft_margin
    _, max_pos = best_pos_distance(q_vec, pos_vecs)
    min_neg, _ = best_pos_distance(q_vec, neg_vecs)
    min_other_neg, _ = best_pos_distance(other_neg, neg_vecs)
    hard_neg = jnp.minimum(min_neg, min_other_neg)
    return jnp.mean(jnp.maximum(m1 + max_pos - hard_neg, 0.0))
