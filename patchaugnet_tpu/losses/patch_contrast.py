"""Patch feature-contrast (a2b) loss — vectorised, padded redesign.

The reference implements this with a python loop over (query, positive)
cloud pairs, per-pair numpy index matching against protobuf overlap
records, and per-row ``index_select`` device syncs
(train_place_recognition.py:308-385) — a known hot/slow section
(SURVEY.md §3.5). Here the host builds **fixed-size padded
correspondence tables** once per batch (data/overlap.py) and the whole
loss is one jitted gather + segment-mean:

  per pair p:   L_p = mean_rows ||q - pos||^2
                    + mean_rows max(margin - ||q - neg||, 0)^2
  total       = sum_p L_p / #valid_pairs

which reproduces ``contrastive_loss`` (losses/pointnetvlad_loss.py:170-186)
and the equal-weight pair averaging at train_place_recognition.py:380-384.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PatchCorrespondences(NamedTuple):
    """Padded correspondence rows for one tuple-batch.

    All arrays have static shapes; ``row_valid`` masks padding. Rows are
    grouped by ``pair_id`` in ``[0, num_pairs)``; pairs with zero valid
    rows are masked out of the final average.
    """

    row_q_cloud: jax.Array   # (T,) int32 — cloud index of the query patch
    row_n_cloud: jax.Array   # (T,) int32 — cloud index of the pos/neg patches
    row_q_idx: jax.Array     # (T,) int32 — query patch slot in [0, M)
    row_pos_idx: jax.Array   # (T,) int32 — positive patch slot
    row_neg_idx: jax.Array   # (T,) int32 — negative patch slot
    row_pair_id: jax.Array   # (T,) int32 — owning (q, pos) cloud pair
    row_valid: jax.Array     # (T,) bool
    num_pairs: int           # static upper bound on pair count

    @staticmethod
    def empty(max_rows: int, num_pairs: int) -> "PatchCorrespondences":
        z = jnp.zeros((max_rows,), jnp.int32)
        return PatchCorrespondences(
            z, z, z, z, z, z, jnp.zeros((max_rows,), bool), num_pairs
        )


# pair_id is segment-summed; keep it out of autodiff.
jax.tree_util.register_pytree_node(
    PatchCorrespondences,
    lambda c: (
        (c.row_q_cloud, c.row_n_cloud, c.row_q_idx, c.row_pos_idx,
         c.row_neg_idx, c.row_pair_id, c.row_valid),
        c.num_pairs,
    ),
    lambda aux, ch: PatchCorrespondences(*ch, aux),
)


def patch_contrastive_loss(
    patch_features: jax.Array,
    corr: PatchCorrespondences,
    margin: float,
) -> jax.Array:
    """a2b contrast over padded correspondences.

    Args:
      patch_features: ``(B, M, D)`` L2-normalised patch features for the
        flattened tuple batch (PatchAugNet ``patch_data.patch_features``).
      corr: padded correspondence tables.
      margin: MARGIN_1 from the config.

    Returns scalar loss (0 when no valid pair exists).
    """
    valid = corr.row_valid.astype(patch_features.dtype)    # (T,)
    q = patch_features[corr.row_q_cloud, corr.row_q_idx]   # (T, D)
    p = patch_features[corr.row_n_cloud, corr.row_pos_idx]
    n = patch_features[corr.row_n_cloud, corr.row_neg_idx]

    qp = jnp.sum((q - p) ** 2, axis=-1)                    # (T,)
    # torch F.pairwise_distance adds eps=1e-6 inside the norm; the 1e-12
    # under the sqrt keeps grads finite at zero distance instead.
    qn = jnp.sqrt(jnp.sum((q - n) ** 2, axis=-1) + 1e-12)
    qn = jnp.maximum(margin - qn, 0.0) ** 2

    num_pairs = corr.num_pairs
    seg = corr.row_pair_id
    cnt = jax.ops.segment_sum(valid, seg, num_pairs)       # (P,)
    qp_mean = jax.ops.segment_sum(qp * valid, seg, num_pairs) / jnp.maximum(cnt, 1.0)
    qn_mean = jax.ops.segment_sum(qn * valid, seg, num_pairs) / jnp.maximum(cnt, 1.0)
    pair_valid = (cnt > 0).astype(patch_features.dtype)
    pair_loss = (qp_mean + qn_mean) * pair_valid
    return jnp.sum(pair_loss) / jnp.maximum(jnp.sum(pair_valid), 1.0)


def contrastive_loss(
    q_vec: jax.Array, pos_vec: jax.Array, neg_vec: jax.Array, margin: float
) -> jax.Array:
    """Direct port of ``contrastive_loss`` (pointnetvlad_loss.py:170-186)
    on stacked ``(M, D)`` rows (no padding) — used by tests as the oracle
    for :func:`patch_contrastive_loss`."""
    total = 0.0
    if pos_vec.shape[0] > 0:
        d = jnp.sqrt(jnp.sum((q_vec - pos_vec) ** 2, axis=-1) + 1e-12)
        total = total + jnp.mean(d ** 2)
    if neg_vec.shape[0] > 0:
        d = jnp.sqrt(jnp.sum((q_vec - neg_vec) ** 2, axis=-1) + 1e-12)
        total = total + jnp.mean(jnp.maximum(margin - d, 0.0) ** 2)
    return total
