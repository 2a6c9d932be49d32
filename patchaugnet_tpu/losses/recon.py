"""Reconstruction losses: chamfer / EMD on full clouds and patch stacks.

TPU-native equivalents of ``losses/pointnetvlad_loss.py``:
  - :func:`chamfer_loss`        (:189-202)  — ChamferDistanceL1 on clouds
  - :func:`emd_loss`            (:205-221)  — auction EMD, eps=0.02 iters=1024
  - :func:`point_pair_loss`     (:224-239)
  - :func:`patch_chamfer_loss`  (:242-247)
  - :func:`patch_emd_loss`      (:250-256)

The patch variants additionally take an optional validity mask: the
reference only stacks patches from "related clouds" (those in nn_dict,
patch_aug_net.py:68-103); here the model emits patches for every cloud
and the mask reproduces the related-clouds-only mean.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import auction_emd, chamfer_sqdists

_EPS = 1e-12


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Mean of x over all elements, restricted to mask (broadcast over
    trailing axes)."""
    if mask is None:
        return jnp.mean(x)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def chamfer_l1_masked(
    xyz1: jax.Array, xyz2: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """ChamferDistanceL1 reduction with an optional leading-dims mask."""
    d1, d2 = chamfer_sqdists(xyz1, xyz2)
    return (
        _masked_mean(jnp.sqrt(d1 + _EPS), mask)
        + _masked_mean(jnp.sqrt(d2 + _EPS), mask)
    ) / 2.0


def chamfer_loss(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """L1 chamfer between batched clouds ``(B, N, 3)``."""
    return chamfer_l1_masked(pc1, pc2, None)


def emd_loss(
    pc1: jax.Array, pc2: jax.Array, eps: float = 0.02, iters: int = 1024,
    unass_floor: int = 0, eps_schedule=None,
) -> jax.Array:
    """mean over clouds of mean per-point euclidean EMD distance
    (pointnetvlad_loss.py:218-221).

    COST WARNING: the auction runs ``iters`` sequential device rounds —
    ~0.69 s warm per (4, 4096)-point call at the reference eps/iters on
    a v5e (round 4's price-fused sweep + active-set tail, exact; was
    1.4 s), vs ~112 ms for a FULL train step with chamfer losses.
    Selecting ``emd_loss``/``patch_emd_loss`` as the reconstruction
    loss slows training ~7x; the reference default is chamfer
    (train_place_recognition.py uses chamfer_loss), which this
    framework keeps as its practical default. See README "EMD cost
    cliff". The opt-in convergence knobs cut the call to 0.14-0.17 s
    with documented mean-distance tolerance: ``unass_floor=ceil(n/100)``
    and/or ``eps_schedule=(10.0, 1.0)`` — see ops/emd.py."""
    dist, _ = auction_emd(
        pc1, pc2, eps, iters, None, unass_floor,
        tuple(eps_schedule) if eps_schedule else None,
    )
    return jnp.mean(jnp.mean(jnp.sqrt(dist + _EPS), axis=1))


def point_pair_loss(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Mean pointwise euclidean distance (pointnetvlad_loss.py:224-239)."""
    return jnp.mean(jnp.sqrt(jnp.sum((pc1 - pc2) ** 2, axis=-1) + _EPS))


def patch_chamfer_loss(
    origin_patches: jax.Array,
    recon_patches: jax.Array,
    cloud_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """L1 chamfer over stacked patches.

    Args:
      origin_patches / recon_patches: ``(B, M, k, 3)`` (model emits all
        clouds; reference stacks only related clouds' ``(M, k, 3)``).
      cloud_mask: optional ``(B,)`` bool — which clouds participate.
    """
    d1, d2 = chamfer_sqdists(origin_patches, recon_patches)  # (B, M, k) x2
    return (
        _masked_mean(jnp.sqrt(d1 + _EPS), cloud_mask)
        + _masked_mean(jnp.sqrt(d2 + _EPS), cloud_mask)
    ) / 2.0


def patch_emd_loss(
    origin_patches: jax.Array,
    recon_patches: jax.Array,
    cloud_mask: Optional[jax.Array] = None,
    eps: float = 0.02,
    iters: int = 1024,
    unass_floor: int = 0,
    eps_schedule=None,
) -> jax.Array:
    """Auction EMD over stacked patches (pointnetvlad_loss.py:250-256).

    COST WARNING: sequential auction sweeps — see :func:`emd_loss`;
    chamfer (:func:`patch_chamfer_loss`) is the practical default.
    ``unass_floor``/``eps_schedule`` are the opt-in convergence knobs
    (ops/emd.py)."""
    b, m, k, _ = origin_patches.shape
    dist, _ = auction_emd(
        origin_patches.reshape(b * m, k, 3),
        recon_patches.reshape(b * m, k, 3),
        eps,
        iters,
        None,
        unass_floor,
        tuple(eps_schedule) if eps_schedule else None,
    )
    per_patch = jnp.mean(jnp.sqrt(dist + _EPS), axis=1).reshape(b, m)
    return _masked_mean(per_patch, cloud_mask)
