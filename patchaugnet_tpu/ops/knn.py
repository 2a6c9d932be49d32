"""k-nearest-neighbour / ball queries on fixed-shape point sets.

TPU-native equivalents of:
  - ``pointops.knnquery``        (/root/reference/libs/pointops/functions/pointops.py:407-433,
                                  kernel libs/pointops/src/knnquery/knnquery_cuda_kernel.cu:6-50)
  - ``KNN_CUDA``                 (/root/reference/libs/KNN_CUDA/knn_cuda/__init__.py:41-74)
  - ``pointops.ballquery``       (pointops.py:175-197,
                                  kernel libs/pointops/src/ballquery/ballquery_cuda_kernel.cu:6-60)
  - the dilated-kNN candidate draw of ``QueryAndGroup_Edge``
                                 (pointops.py:551-555)

Design: one batched pairwise-distance contraction (MXU) followed by
``lax.top_k`` per query row. All shapes static; returns padded
fixed-degree ``(b, m, k)`` neighbour tables.

Tie-breaking: ``lax.top_k`` prefers the lowest index among equal
distances; the CUDA insertion sort is stable in scan order, which gives
the same result for distinct distances (documented divergence for exact
duplicates).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import contracts
from .pairwise import pairwise_sqdist
from .pallas import on_tpu as _on_tpu


def knn(
    xyz: jax.Array,
    new_xyz: Optional[jax.Array],
    k: int,
    approx_recall: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbours of ``new_xyz`` among ``xyz``.

    Args:
      xyz: ``(b, n, d)`` reference points.
      new_xyz: ``(b, m, d)`` query points (``None`` -> ``xyz``).
      k: number of neighbours (static).
      approx_recall: when set (e.g. 0.95), use the TPU PartialReduce
        top-k (``lax.approx_max_k``) at that per-query recall target —
        ~6x faster than the exact sort-based ``top_k`` at k=20..40 over
        4096 candidates. ``None`` = exact (reference parity).

    Returns:
      ``(idx, sqdist)``: ``(b, m, k)`` int32 indices sorted by ascending
      distance, and the matching squared distances.
    """
    contracts.check_features(xyz, "xyz")
    if new_xyz is None:
        new_xyz = xyz
    contracts.check_features(new_xyz, "new_xyz")
    contracts.check_same_batch(xyz, new_xyz, "xyz", "new_xyz")
    contracts.check_k(k, xyz.shape[-2])
    if approx_recall is not None:
        d = pairwise_sqdist(new_xyz, xyz)                  # (b, m, n)
        neg, idx = jax.lax.approx_max_k(-d, k, recall_target=approx_recall)
        return idx.astype(jnp.int32), -neg
    qb = _pallas_query_block(new_xyz.shape[-2])
    if _on_tpu() and qb is not None:
        from .pallas.knn import knn_pallas

        return knn_pallas(xyz, new_xyz, k, query_block=qb)
    d = pairwise_sqdist(new_xyz, xyz)                      # (b, m, n)
    neg, idx = jax.lax.top_k(-d, k)                        # ascending distance
    return idx.astype(jnp.int32), -neg


def _pallas_query_block(m: int) -> Optional[int]:
    """Largest query-block size (<=256, multiple of 8 or the full m)
    that evenly divides m; None disables the Pallas kNN path."""
    if m <= 256:
        return m
    for qb in range(256, 7, -8):
        if m % qb == 0:
            return qb
    return None


def dilated_knn(
    xyz: jax.Array,
    new_xyz: Optional[jax.Array],
    k: int,
    dilation: int = 1,
    key: Optional[jax.Array] = None,
    approx_recall: Optional[float] = None,
) -> jax.Array:
    """Dilated kNN exactly as the reference's ``QueryAndGroup_Edge``.

    The reference queries ``dilation * k`` candidates and then indexes the
    **first k** of them with ``torch.randperm(k)`` (pointops.py:553-555) —
    i.e. a shared random permutation of the true k nearest, *not* a sample
    of the dilated candidate set. The first k of the (sorted) dilated
    candidates ARE the plain k nearest, so only k neighbours are ever
    extracted here (halves the selection sweeps at the reference's
    KNN_DILATION=2 with identical indices). Downstream consumers
    (SharedMLP + neighbour max-pool, chamfer on grouped patches) are
    permutation invariant, so when ``key`` is ``None`` the shuffle is
    skipped too.
    """
    idx, _ = knn(xyz, new_xyz, k, approx_recall)
    if dilation > 1 and key is not None:
        perm = jax.random.permutation(key, k)
        idx = idx[..., perm]
    return idx


def ball_query(
    radius: float,
    k: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
) -> jax.Array:
    """Fixed-size radius query with the reference's padding semantics.

    The CUDA kernel (ballquery_cuda_kernel.cu:6-60) walks points in index
    order, keeps the first ``k`` within ``radius``, and pre-fills every
    slot with the *first* in-radius index; queries with no neighbour at
    all keep the zero initialisation.

    Returns ``(b, m, k)`` int32 indices.
    """
    n = xyz.shape[-2]
    d = pairwise_sqdist(new_xyz, xyz)                      # (b, m, n)
    in_ball = d < radius * radius
    # Pick the k smallest indices among in-ball points (scan order).
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    score = jnp.where(in_ball, -iota, jnp.iinfo(jnp.int32).min)
    top, _ = jax.lax.top_k(score, k)                       # (b, m, k)
    valid = top != jnp.iinfo(jnp.int32).min
    idx = jnp.where(valid, -top, 0)
    # Pad trailing slots with the first in-radius index (slot 0).
    first = idx[..., :1]
    idx = jnp.where(valid, idx, first)
    # No neighbour at all -> keep zeros (CUDA zero-init).
    any_valid = valid[..., :1]
    idx = jnp.where(any_valid, idx, 0)
    return idx.astype(jnp.int32)


def knn_exclude_self(xyz: jax.Array, new_xyz: Optional[jax.Array], k: int) -> jax.Array:
    """kNN skipping the closest match (reference ``KNNQueryExclude``,
    pointops.py:436-473: returns ranks ``1..k`` instead of ``0..k-1``)."""
    idx, _ = knn(xyz, new_xyz, k + 1)
    return idx[..., 1:]
