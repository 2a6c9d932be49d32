"""Pairwise squared-distance primitives.

TPU-native replacement for the distance scans inside the reference CUDA
kernels (``libs/pointops/src/knnquery/knnquery_cuda_kernel.cu:6-50``,
``libs/KNN_CUDA/knn_cuda/csrc/cuda/knn.cu:29-93``).

Two formulations, dispatched on the coordinate width:

- ``d <= 4`` (xyz space — every pointops/chamfer consumer): direct
  per-coordinate ``(x - y)^2`` differences, unrolled over ``d``. XLA
  fuses the subtract/square/accumulate into a single output loop, so
  the ``(n, m)`` matrix is written in one HBM pass with no ``x.y^T``
  intermediate; this is also exactly the reference CUDA kernels'
  arithmetic (per-coordinate f32 subtraction, no expansion error).
  Measured on v5e at the PatchAugNet level-1 shape (B=32, 1024x4096
  queries x candidates + extraction): 12.3 ms vs 18.1 ms for the
  matmul form at f32-equivalent (3-pass bf16) precision.
- wider ``d`` (feature-space retrieval, miners): the classic
  ``||x||^2 + ||y||^2 - 2 x.y^T`` contraction that XLA tiles onto the
  MXU — at d=256 the matmul dominates and the MXU is the right unit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# widest coordinate dim that uses the direct-difference formulation
_DIRECT_MAX_D = 4


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
    if x.shape[-1] != y.shape[-1]:
        raise ValueError(
            f"pairwise_sqdist: coordinate widths differ, "
            f"x {x.shape} vs y {y.shape}"
        )
    if x.shape[-1] <= _DIRECT_MAX_D:
        shape = jnp.broadcast_shapes(
            x.shape[:-2] + (x.shape[-2], 1), y.shape[:-2] + (1, y.shape[-2])
        )
        d = jnp.zeros(shape, jnp.promote_types(x.dtype, y.dtype))
        for c in range(x.shape[-1]):
            diff = x[..., :, None, c] - y[..., None, :, c]
            d = d + diff * diff
        return jnp.maximum(d, 0.0)
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
