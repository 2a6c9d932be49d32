"""Secondary loss zoo (jittable, masked re-designs of dynamic-shape torch code).

TPU-native equivalents of:
  - :func:`truncated_smooth_ap`  <- ``TruncatedSmoothAP``
        (losses/truncated_smoothap.py:11-107; the MinkLoc3Dv2 training
        loss). Dynamic boolean row filtering becomes masked means.
  - :func:`multi_similarity_loss` <- ``MultiSimilarityLoss._forward_apn``
        (losses/multi_similarity_loss.py:25-47). The dynamic negative
        filter ``neg_sim[neg_sim + margin > min(pos_sim)]`` becomes a
        multiplicative mask inside the log-sum-exp.
  - :func:`binary_focal_loss` / :func:`focal_loss`
        (losses/focal_loss.py:5-64).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import l2_normalize

_NEG_INF = -1e30


def cosine_affinity(embeddings: jax.Array) -> jax.Array:
    """Pairwise cosine similarity (losses/loss_utils.py compute_aff)."""
    e = l2_normalize(embeddings, axis=-1)
    return e @ e.T


def truncated_smooth_ap(
    embeddings: jax.Array,
    positives_mask: jax.Array,
    negatives_mask: jax.Array,
    tau1: float = 0.01,
    positives_per_query: int = 4,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Recall@k surrogate loss over an ``(N, D)`` embedding batch.

    Returns ``(loss, stats)`` like the reference ``__call__``.
    """
    n = embeddings.shape[0]
    top_k = min(positives_per_query, n)
    s_qz = cosine_affinity(embeddings)                     # (N, N)

    s_positives = jnp.where(positives_mask, jax.lax.stop_gradient(s_qz), _NEG_INF)
    _, closest_pos = jax.lax.top_k(s_positives, top_k)     # (N, top_k)

    # rank sigmoid on similarity differences, Eq. (2)
    s_at_pos = jnp.take_along_axis(s_qz, closest_pos, axis=1)  # (N, top_k)
    s_diff = s_qz[:, None, :] - s_at_pos[:, :, None]           # (N, top_k, N)
    s_sig = jax.nn.sigmoid(s_diff / tau1)

    pos_s = s_sig * positives_mask[:, None, :]
    # zero the position of the positive itself
    self_mask = jax.nn.one_hot(closest_pos, n, dtype=s_sig.dtype)  # (N, top_k, N)
    pos_s = pos_s * (1.0 - self_mask)
    r_p = jnp.sum(pos_s, axis=2) + 1.0                     # (N, top_k)

    neg_s = s_sig * negatives_mask[:, None, :]
    r_omega = r_p + jnp.sum(neg_s, axis=2)
    r = r_p / r_omega

    valid_pos = jnp.take_along_axis(positives_mask, closest_pos, axis=1)
    masked_r = r * valid_pos
    n_valid = jnp.sum(valid_pos, axis=1)
    q_valid = (n_valid > 0).astype(r.dtype)
    per_q_ap = jnp.sum(masked_r, axis=1) / jnp.maximum(n_valid, 1.0)
    ap = jnp.sum(per_q_ap * q_valid) / jnp.maximum(jnp.sum(q_valid), 1.0)
    loss = 1.0 - ap

    # recall@1 over the batch (best positive's hard ranking)
    hard_rank = jnp.sum(
        jnp.logical_and(jax.lax.stop_gradient(s_diff)[:, 0, :] > 0, negatives_mask),
        axis=1,
    )
    stats = {
        "loss": loss,
        "ap": ap,
        "positives_per_query": jnp.mean(jnp.sum(positives_mask, axis=1).astype(jnp.float32)),
        "recall_at_1": jnp.mean((hard_rank <= 1).astype(jnp.float32)),
        "avg_embedding_norm": jnp.mean(jnp.linalg.norm(embeddings, axis=1)),
    }
    return loss, stats


def _cosine_sim_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(l2_normalize(a, -1) * l2_normalize(b, -1), axis=-1)


def multi_similarity_loss(
    a_feat: jax.Array,
    p_feat: jax.Array,
    n_feat: jax.Array,
    thresh: float = 0.5,
    margin: float = 0.3,
    scale_pos: float = 2.0,
    scale_neg: float = 40.0,
) -> jax.Array:
    """'apn' mode over ``(b, k, d)`` anchor/positive/negative rows."""
    if a_feat.ndim == 2:
        a_feat, p_feat, n_feat = (x[None] for x in (a_feat, p_feat, n_feat))
    pos_sim = _cosine_sim_rows(a_feat, p_feat)             # (b, k)
    neg_sim = _cosine_sim_rows(a_feat, n_feat)             # (b, k)
    min_pos = jnp.min(pos_sim, axis=1, keepdims=True)
    neg_keep = (neg_sim + margin > min_pos).astype(pos_sim.dtype)
    pos_loss = (1.0 / scale_pos) * jnp.log1p(
        jnp.sum(jnp.exp(-scale_pos * (pos_sim - thresh)), axis=1)
    )
    neg_loss = (1.0 / scale_neg) * jnp.log1p(
        jnp.sum(jnp.exp(scale_neg * (neg_sim - thresh)) * neg_keep, axis=1)
    )
    has_neg = (jnp.sum(neg_keep, axis=1) > 0).astype(pos_sim.dtype)
    per_b = (pos_loss + neg_loss) * has_neg
    return jnp.sum(per_b) / jnp.maximum(jnp.sum(has_neg), 1.0)


def binary_focal_loss(
    logits: jax.Array,
    target: jax.Array,
    gamma: float = 2.0,
    alpha: float = 0.25,
    epsilon: float = 1e-9,
    with_logit: bool = False,
) -> jax.Array:
    p = jax.nn.sigmoid(logits) if with_logit else logits
    t = target.astype(p.dtype)
    loss = -alpha * t * (1 - p) ** gamma * jnp.log(p + epsilon)
    loss += -(1 - alpha) * (1 - t) * p ** gamma * jnp.log(1 - p + epsilon)
    return jnp.mean(loss)


def focal_loss(
    logits: jax.Array,
    target: jax.Array,
    gamma: float = 2.0,
    alpha: float = 1.0,
    epsilon: float = 1e-9,
) -> jax.Array:
    num_labels = logits.shape[-1]
    one_hot = jax.nn.one_hot(target, num_labels)
    one_hot = one_hot.at[:, 0].set(0.0)                    # ignore index 0
    p = jax.nn.softmax(logits, axis=-1)
    loss = -alpha * one_hot * (1 - p) ** gamma * jnp.log(p + epsilon)
    return jnp.mean(jnp.sum(loss, axis=1))
