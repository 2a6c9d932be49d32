"""Label-statistics and feature-distribution ops.

TPU-native equivalents of the remaining ``libs/pointops`` surface —
unused by the four in-tree models (SURVEY §2.1 "port as ops-library
completeness") but part of the public op set:

  - :func:`labelstat_ballrange`   <- pointops.py:259-285, kernel
        labelstat_cuda_kernel.cu (per-centre class-count histograms of
        points within a radius)
  - :func:`labelstat_idx`         <- pointops.py:288-312 (histograms
        over an explicit neighbour-index table)
  - :func:`labelstat_and_ballquery` <- pointops.py:315-344 (fused)
  - :func:`featuredistribute`     <- pointops.py:200-221 (nearest "max
        point" per point, argmin over the distance matrix)
  - :func:`featuregather`         <- pointops.py:224-256 (gather by the
        distribute index; scatter-add backward comes from autodiff)

All masked segment-sums / gathers over fixed shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .knn import ball_query
from .grouping import gather, group
from .pairwise import pairwise_sqdist


def labelstat_ballrange(
    radius: float,
    xyz: jax.Array,
    new_xyz: jax.Array,
    label_stat: jax.Array,
) -> jax.Array:
    """Sum per-class counts of all points within ``radius`` of each
    centre.

    Args:
      xyz: ``(b, n, 3)``; new_xyz: ``(b, m, 3)``;
      label_stat: ``(b, n, nclass)`` int counts.
    Returns: ``(b, m, nclass)`` int32.
    """
    d = pairwise_sqdist(new_xyz, xyz)                      # (b, m, n)
    in_ball = (d < radius * radius).astype(jnp.int32)
    return jnp.einsum("bmn,bnc->bmc", in_ball, label_stat.astype(jnp.int32))


def labelstat_idx(label_stat: jax.Array, idx: jax.Array) -> jax.Array:
    """Sum class counts over an explicit ``(b, m, nsample)`` index table."""
    grouped = group(label_stat.astype(jnp.int32), idx)     # (b, m, k, nclass)
    return jnp.sum(grouped, axis=2)


def labelstat_and_ballquery(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    label_stat: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Fused variant: returns ``(new_label_stat, idx)``.

    NB the CUDA kernel sums over ALL in-radius points (not only the
    nsample kept in idx) — reproduced here (labelstat_cuda_kernel.cu:5-50).
    """
    stat = labelstat_ballrange(radius, xyz, new_xyz, label_stat)
    idx = ball_query(radius, nsample, xyz, new_xyz)
    return stat, idx


def featuredistribute(max_xyz: jax.Array, xyz: jax.Array) -> jax.Array:
    """Index of the nearest ``max_xyz`` point for each ``xyz`` point.

    Args: max_xyz ``(b, n, 3)``, xyz ``(b, m, 3)``.
    Returns: ``(b, m)`` int32.
    """
    d = pairwise_sqdist(xyz, max_xyz)                      # (b, m, n)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def featuregather(max_feature: jax.Array, distribute_idx: jax.Array) -> jax.Array:
    """Gather features by distribute index: ``(b, n, c), (b, m) -> (b, m, c)``.

    Autodiff provides the scatter-add backward the CUDA kernel
    hand-writes (featuredistribute_cuda_kernel.cu:54-...).
    """
    return gather(max_feature, distribute_idx)
