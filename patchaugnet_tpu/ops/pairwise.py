"""Pairwise squared-distance primitives.

TPU-native replacement for the distance scans inside the reference CUDA
kernels (``libs/pointops/src/knnquery/knnquery_cuda_kernel.cu:6-50``,
``libs/KNN_CUDA/knn_cuda/csrc/cuda/knn.cu:29-93``): the brute-force
per-query loops become one batched ``||x||^2 + ||y||^2 - 2 x.y^T``
contraction that XLA tiles onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared euclidean distances between two point sets.

    Args:
      x: ``(..., n, d)`` query points.
      y: ``(..., m, d)`` reference points.

    Returns:
      ``(..., n, m)`` where ``out[..., i, j] = ||x_i - y_j||^2`` (clamped at 0).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)            # (..., n, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)            # (..., m, 1)
    xy = jnp.einsum(
        "...nd,...md->...nm", x, y, preferred_element_type=jnp.float32
    )
    d = x2 + jnp.swapaxes(y2, -1, -2) - 2.0 * xy
    return jnp.maximum(d, 0.0)


def self_sqdist(x: jax.Array) -> jax.Array:
    """``pairwise_sqdist(x, x)`` with exact zeros on the diagonal."""
    d = pairwise_sqdist(x, x)
    n = d.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, 0.0, d)
