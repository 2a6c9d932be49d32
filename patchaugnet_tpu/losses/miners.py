"""Batch-hard mining losses and pose-estimation losses (jittable).

TPU-native equivalents of:
  - :func:`batch_hard_triplet_loss`     <- ``BatchHardTripletLossWithMasks``
        (Minkloc3D_V2/models/losses/loss.py:78-101): per-anchor hardest
        positive (max dist) / hardest negative (min dist) over (B, B)
        masks, triplet margin with swap, averaged over non-zero triplets.
  - :func:`batch_hard_contrastive_loss` <- ``BatchHardContrastiveLossWithMasks``
        (loss.py:104-137): contrastive on the mined hard pairs.
  - :func:`contrastive_quadruplet_loss` <- pointnetvlad_loss.py:108-154
        (detached-positive split of the first term).
  - :func:`ot_loss` / :func:`pps_loss`  <- losses/pose_est_loss.py:9-83,
        redesigned over padded index tables (the reference loops python
        lists of variable-length pairs).

Dynamic boolean indexing becomes masked means throughout.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import l2_normalize
from ..ops.pairwise import pairwise_sqdist

_INF = 1e30


def _mine_hard(embeddings, positives_mask, negatives_mask):
    """Hardest positive (max dist) / negative (min dist) per anchor."""
    d = jnp.sqrt(
        jnp.maximum(pairwise_sqdist(embeddings[None], embeddings[None])[0], 0.0)
        + 1e-12
    )
    pos_d = jnp.where(positives_mask, d, 0.0)
    hardest_pos = jnp.max(pos_d, axis=1)
    hardest_pos_idx = jnp.argmax(pos_d, axis=1)
    neg_d = jnp.where(negatives_mask, d, _INF)
    hardest_neg = jnp.min(neg_d, axis=1)
    hardest_neg_idx = jnp.argmin(neg_d, axis=1)
    keep = jnp.any(positives_mask, axis=1) & jnp.any(negatives_mask, axis=1)
    return d, hardest_pos, hardest_pos_idx, hardest_neg, hardest_neg_idx, keep


def batch_hard_triplet_loss(
    embeddings: jax.Array,
    positives_mask: jax.Array,
    negatives_mask: jax.Array,
    margin: float = 0.2,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Triplet margin with swap over mined hard triplets; mean over
    non-zero triplets (AvgNonZeroReducer)."""
    d, hp, hp_i, hn, hn_i, keep = _mine_hard(
        embeddings, positives_mask, negatives_mask
    )
    # swap=True: negative distance is min(d(a, n), d(p, n))
    d_pn = d[hp_i, hn_i]
    neg_dist = jnp.minimum(hn, d_pn)
    per_anchor = jnp.maximum(hp - neg_dist + margin, 0.0) * keep
    nonzero = (per_anchor > 0).astype(embeddings.dtype)
    loss = jnp.sum(per_anchor) / jnp.maximum(jnp.sum(nonzero), 1.0)
    stats = {
        "loss": loss,
        "num_triplets": jnp.sum(keep.astype(jnp.int32)),
        "num_non_zero_triplets": jnp.sum(nonzero),
        "mean_pos_pair_dist": jnp.sum(hp * keep) / jnp.maximum(jnp.sum(keep), 1),
        "mean_neg_pair_dist": jnp.sum(jnp.where(keep, hn, 0.0))
        / jnp.maximum(jnp.sum(keep), 1),
        "avg_embedding_norm": jnp.mean(jnp.linalg.norm(embeddings, axis=1)),
    }
    return loss, stats


def batch_hard_contrastive_loss(
    embeddings: jax.Array,
    positives_mask: jax.Array,
    negatives_mask: jax.Array,
    pos_margin: float = 0.2,
    neg_margin: float = 0.65,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Contrastive on mined hard pairs: hinge(d_ap - pos_margin) +
    hinge(neg_margin - d_an), each averaged over its non-zero set."""
    _, hp, _, hn, _, keep = _mine_hard(embeddings, positives_mask, negatives_mask)
    pos_term = jnp.maximum(hp - pos_margin, 0.0) * keep
    neg_term = jnp.maximum(neg_margin - hn, 0.0) * keep
    pos_nz = (pos_term > 0).astype(embeddings.dtype)
    neg_nz = (neg_term > 0).astype(embeddings.dtype)
    pos_loss = jnp.sum(pos_term) / jnp.maximum(jnp.sum(pos_nz), 1.0)
    neg_loss = jnp.sum(neg_term) / jnp.maximum(jnp.sum(neg_nz), 1.0)
    loss = pos_loss + neg_loss
    stats = {
        "loss": loss,
        "pos_loss": pos_loss,
        "neg_loss": neg_loss,
        "num_pairs": 2 * jnp.sum(keep.astype(jnp.int32)),
        "avg_embedding_norm": jnp.mean(jnp.linalg.norm(embeddings, axis=1)),
    }
    return loss, stats


def contrastive_quadruplet_loss(
    q_vec, pos_vecs, neg_vecs, other_neg, m1, m2,
    use_min=False, lazy=True, ignore_zero_loss=False, soft_margin=False,
):
    """pointnetvlad_loss.py:108-154: the first term splits the batch by
    whether the hardest negative is closer than the positive; the
    positive distance is detached on the violated side."""
    del soft_margin
    diff_pos = jnp.sum((pos_vecs - q_vec) ** 2, axis=2)
    positive = jnp.min(diff_pos, 1) if use_min else jnp.max(diff_pos, 1)
    negative = jnp.sum((neg_vecs - q_vec) ** 2, axis=2)     # (B, N)
    min_neg = jnp.min(negative, axis=1)
    violated = min_neg < positive
    l1 = jnp.maximum(m1 + jax.lax.stop_gradient(positive) - min_neg, 0.0)
    l2 = jnp.maximum(m1 + positive - min_neg, 0.0)
    triplet = jnp.sum(jnp.where(violated, l1, l2)) / q_vec.shape[0]

    second = jnp.maximum(
        m2 + positive[:, None] - jnp.sum((neg_vecs - other_neg) ** 2, axis=2), 0.0
    )
    second = jnp.max(second, axis=1) if lazy else jnp.mean(second, axis=1)
    if ignore_zero_loss:
        hard = (second > 1e-16).astype(second.dtype)
        second = jnp.sum(second) / (jnp.sum(hard) + 1e-16)
    else:
        second = jnp.mean(second)
    return triplet + second


def ot_loss(
    scores: jax.Array,
    pair_idx: jax.Array,
    pair_valid: jax.Array,
    unpair0: jax.Array,
    unpair0_valid: jax.Array,
    unpair1: jax.Array,
    unpair1_valid: jax.Array,
    use_unpair: bool = True,
) -> jax.Array:
    """Optimal-transport matching loss over padded index tables.

    Args:
      scores: ``(B, M+1, N+1)`` log-assignment scores (dustbin row/col).
      pair_idx: ``(B, P, 2)`` matched (i, j); pair_valid ``(B, P)``.
      unpair0/1: ``(B, U)`` unmatched indices in cloud 0 / 1 with masks.
    """
    logscore = -scores
    b = scores.shape[0]
    bidx = jnp.arange(b)[:, None]

    pv = pair_valid.astype(scores.dtype)
    p_scores = logscore[bidx, pair_idx[..., 0], pair_idx[..., 1]]
    per_b_p = jnp.sum(p_scores * pv, axis=1) / jnp.maximum(jnp.sum(pv, axis=1), 1.0)
    has_pairs = jnp.any(pair_valid, axis=1)

    total = per_b_p
    if use_unpair:
        u0 = unpair0_valid.astype(scores.dtype)
        s0 = logscore[bidx, unpair0, -1]
        per_b_u0 = jnp.sum(s0 * u0, axis=1) / jnp.maximum(jnp.sum(u0, axis=1), 1.0)
        per_b_u0 = per_b_u0 * jnp.any(unpair0_valid, axis=1)
        u1 = unpair1_valid.astype(scores.dtype)
        s1 = logscore[bidx, -1, unpair1]
        per_b_u1 = jnp.sum(s1 * u1, axis=1) / jnp.maximum(jnp.sum(u1, axis=1), 1.0)
        per_b_u1 = per_b_u1 * jnp.any(unpair1_valid, axis=1)
        total = total + per_b_u0 + per_b_u1
    nvalid = jnp.sum(has_pairs.astype(scores.dtype))
    return jnp.sum(total * has_pairs) / jnp.maximum(nvalid, 1.0)


def pps_loss(
    src_feat: jax.Array,
    tgt_feat: jax.Array,
    neg_idxs: jax.Array,
    neg_valid: jax.Array,
    margin: float = 0.5,
) -> jax.Array:
    """Point-pair similarity loss over padded tables
    (pose_est_loss.py:34-83): anchors from src, positives from tgt, the
    *closest* of the candidate negatives per row; squared-distance
    contrast with margin.

    Args:
      src_feat/tgt_feat: ``(B, M, D)``.
      neg_idxs: ``(B, R, 2 + num_keep)`` rows of (src_idx, tgt_pos_idx,
        tgt_neg candidates...); neg_valid ``(B, R)``.
    """
    src = l2_normalize(src_feat, -1)
    tgt = l2_normalize(tgt_feat, -1)
    b = src.shape[0]
    bidx = jnp.arange(b)[:, None]
    a = src[bidx, neg_idxs[..., 0]]                        # (B, R, D)
    p = tgt[bidx, neg_idxs[..., 1]]
    cand = tgt[bidx[..., None], neg_idxs[..., 2:]]         # (B, R, K, D)
    an_d = jnp.sqrt(jnp.sum((a[:, :, None] - cand) ** 2, -1) + 1e-12)
    hard = jnp.argmin(an_d, axis=-1)                       # (B, R)
    n = jnp.take_along_axis(cand, hard[..., None, None], axis=2)[:, :, 0]
    v = neg_valid.astype(src.dtype)
    nv = jnp.maximum(jnp.sum(v), 1.0)
    ap = jnp.sum(jnp.sum((a - p) ** 2, -1) * v) / nv
    an = jnp.sqrt(jnp.sum((a - n) ** 2, -1) + 1e-12)
    an = jnp.sum(jnp.maximum(margin - an, 0.0) ** 2 * v) / nv
    return ap + an
