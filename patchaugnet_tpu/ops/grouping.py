"""Gather / group / 3-NN interpolation.

TPU-native equivalents (channels-last ``(b, n, c)`` layout) of:
  - ``pointops.gathering``      (pointops.py:32-57; backward scatter-add is
                                 free via JAX autodiff)
  - ``pointops.grouping``       (pointops.py:121-150, kernel
                                 libs/pointops/src/grouping/grouping_cuda_kernel.cu:6-94)
  - ``pointops.nearestneighbor`` + ``pointops.interpolation``
                                (pointops.py:60-118, kernel
                                 libs/pointops/src/interpolation/interpolation_cuda_kernel.cu)
  - ``QueryAndGroup_Edge``      (pointops.py:519-582): kNN/ball grouping with
                                 EdgeConv-style centering of both xyz and
                                 features.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import contracts, pallas
from .knn import ball_query, dilated_knn
from .pairwise import pairwise_sqdist


def gather(features: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[b, j, c] = features[b, idx[b, j], c]``.

    Args:
      features: ``(b, n, c)``.
      idx: ``(b, m)`` int indices, each in ``[0, n)``.
    Returns: ``(b, m, c)``.

    Implemented as one flat row-gather with batch offsets — ~20% faster
    than ``take_along_axis`` on TPU for the SA/FP grouping shapes.

    OOB semantics are ``clip`` on the FLAT index (round 4): the default
    ``jnp.take`` fill mode wraps the gather in compare/and/select
    fusions over the WIDE gathered output (measured 24 ms/iter of
    ``broadcast_select_fusion`` on the sparse MinkLoc forward —
    profiles/README.md), while HLO gather already clamps start indices
    for free. Fill mode never gave per-batch OOB protection here anyway:
    ``idx + b*n`` lands an OOB row in the NEXT batch element, in bounds
    globally — so the contract is and was "callers pass in-range rows".
    On the batch-chunked path (tables >48 MB or >1.5M indices) the clip
    applies to each chunk's flat table, so a globally-OOB index clamps
    to a different row than the unchunked path — chunked and flat
    outputs are only bit-identical for in-range indices (which is the
    contract). Set ``PCR_DEBUG=1`` to poison OOB gathers with NaN
    (float features) so index-range bugs fail loudly in tests instead
    of silently reading a clamped row.
    """
    # dtype-generic (the reference ships Grouping AND GroupingInt,
    # pointops.py:121-172) — contract covers rank + index dtype only
    assert features.ndim == 3, f"features: expected (B, N, C), got {features.shape}"
    contracts.check_indices(idx, "idx", rank=2)
    contracts.check_same_batch(features, idx, "features", "idx")
    b, n, c = features.shape
    # XLA's TPU gather emitter flips to a serialized strategy once the
    # flat source table outgrows ~32-64 MB or the index count grows past
    # ~1-2M (profiles/README.md: fp0 13.5x, sa0 7.5x slower at the
    # reference's batch-100 eval protocol). Unrolled batch chunks keep
    # every sub-gather on the fast path — bit-exact, and a no-op for
    # every batch-32 shape (measured on-chip round 3: fp0 B=100
    # 8.6 -> 4.6 ms, sa0 12.0 -> 8.9 ms; the round-2 lax.map attempt
    # lost to serialization, unrolled chunks do not).
    table_bytes = b * n * c * features.dtype.itemsize
    n_idx = b * idx.shape[1]
    nc = 1
    if table_bytes > 48 * 1024 * 1024:
        nc = -(-table_bytes // (16 * 1024 * 1024))
    if n_idx > 1_500_000:
        nc = max(nc, -(-n_idx // 512_000))
    nc = min(nc, b)
    if nc > 1:
        bounds = [round(j * b / nc) for j in range(nc + 1)]
        outs = [
            _gather_flat(features[s:e], idx[s:e])
            for s, e in zip(bounds, bounds[1:])
            if e > s
        ]
        out = jnp.concatenate(outs, axis=0)
    else:
        out = _gather_flat(features, idx)
    if _debug_oob() and jnp.issubdtype(features.dtype, jnp.floating):
        # debug-only OOB canary (ADVICE r4): mode="clip" silently reads
        # a clamped row; under PCR_DEBUG an out-of-range index poisons
        # its output row with NaN, identically on both gather paths.
        oob = (idx < 0) | (idx >= n)
        out = jnp.where(oob[..., None], jnp.asarray(jnp.nan, out.dtype), out)
    return out


def _debug_oob() -> bool:
    import os

    return os.environ.get("PCR_DEBUG", "") not in ("", "0")


def _gather_flat(features: jax.Array, idx: jax.Array) -> jax.Array:
    b, n, c = features.shape
    base = (jnp.arange(b, dtype=idx.dtype) * n)[:, None]
    flat = (idx + base).reshape(-1)
    return jnp.take(features.reshape(b * n, c), flat, axis=0, mode="clip").reshape(
        b, idx.shape[1], c
    )


def group(features: jax.Array, idx: jax.Array) -> jax.Array:
    """``out[b, j, s, c] = features[b, idx[b, j, s], c]``.

    Args:
      features: ``(b, n, c)``.
      idx: ``(b, m, k)`` int indices.
    Returns: ``(b, m, k, c)``.
    """
    contracts.check_indices(idx, "idx", rank=3)
    b, m, k = idx.shape
    flat = gather(features, idx.reshape(b, m * k))
    return flat.reshape(b, m, k, features.shape[-1])


def three_nn(unknown: jax.Array, known: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact 3 nearest neighbours of ``unknown`` within ``known``.

    Returns ``(dist, idx)`` with ``dist`` the *euclidean* distance
    (the reference wrapper sqrts the CUDA squared output,
    pointops.py:76), shapes ``(b, n, 3)``.

    Implemented as three masked argmin sweeps instead of ``top_k`` —
    ~7x faster on TPU for k=3 (top_k lowers to a full sort); on TPU
    backends the sweeps run inside the Pallas extraction kernel with the
    distance tile resident in VMEM. Ties still resolve
    lowest-index-first, identical to top_k.
    """
    from .knn import _pallas_query_block

    d = pairwise_sqdist(unknown, known)
    qb = _pallas_query_block(unknown.shape[-2])
    if pallas.on_tpu() and qb is not None:
        from .pallas.knn import topk_extract_pallas

        idx, d2 = topk_extract_pallas(d, 3, query_block=qb)
        return jnp.sqrt(d2), idx
    m = d.shape[-1]
    idxs, dists = [], []
    for _ in range(3):
        i = jnp.argmin(d, axis=-1)
        dists.append(jnp.take_along_axis(d, i[..., None], -1)[..., 0])
        idxs.append(i)
        d = d + jax.nn.one_hot(i, m, dtype=d.dtype) * jnp.asarray(1e30, d.dtype)
    idx = jnp.stack(idxs, axis=-1).astype(jnp.int32)
    return jnp.sqrt(jnp.stack(dists, axis=-1)), idx


def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """Inverse-distance-weighted 3-point interpolation.

    Args:
      features: ``(b, m, c)`` source features.
      idx: ``(b, n, 3)`` neighbour indices into the m axis.
      weight: ``(b, n, 3)`` weights.
    Returns: ``(b, n, c)``.
    """
    # three per-neighbour row-gathers with the weighted sum fused onto
    # them, instead of one (b, n, 3, c) grouped gather + einsum: the 4-D
    # intermediate forced a 1.6 GB physical relayout (device trace
    # reshape.87) plus a separate contraction pass. Same math, same
    # lowest-index tie handling, summed in neighbour order.
    # Accumulate in f32 regardless of the feature dtype (the einsum this
    # replaced guaranteed preferred_element_type=float32; bf16 features
    # would otherwise lose the wide accumulation — ADVICE r2).
    out = None
    for j in range(idx.shape[-1]):
        term = (
            gather(features, idx[..., j]).astype(jnp.float32)
            * weight[..., j : j + 1].astype(jnp.float32)
        )
        out = term if out is None else out + term
    return out.astype(features.dtype)


def interpolate_features(
    unknown_xyz: jax.Array, known_xyz: jax.Array, known_feats: jax.Array
) -> jax.Array:
    """The full FP-module interpolation step (patch_aug_net.py:349-356)."""
    dist, idx = three_nn(unknown_xyz, known_xyz)
    recip = 1.0 / (dist + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return three_interpolate(known_feats, idx, weight)


class GroupedEdgeFeatures(NamedTuple):
    new_features: jax.Array      # (b, m, k, 3 + c) centred xyz ++ centred feats
    grouped_xyz: jax.Array       # (b, m, k, 3) un-centred grouped coordinates
    sample_idx: jax.Array        # (b, m, k) neighbour indices


def query_and_group_edge(
    xyz: jax.Array,
    new_xyz: Optional[jax.Array],
    features: Optional[jax.Array],
    center_features: Optional[jax.Array],
    *,
    nsample: int,
    radius: Optional[float] = None,
    knn_dilation: int = 1,
    use_xyz: bool = True,
    idx: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    approx_recall: Optional[float] = None,
) -> GroupedEdgeFeatures:
    """EdgeConv-style query+group (reference ``QueryAndGroup_Edge``).

    Grouped xyz are centred on ``new_xyz``; grouped features are centred
    on ``center_features`` when ``nsample > 1`` (pointops.py:562-568).
    Output layout is channels-last: ``(b, m, k, 3 + c)``.
    """
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        if radius is not None:
            idx = ball_query(radius, nsample, xyz, new_xyz)
        else:
            idx = dilated_knn(
                xyz, new_xyz, nsample, knn_dilation, key=key,
                approx_recall=approx_recall,
            )
    o_grouped_xyz = group(xyz, idx)                        # (b, m, k, 3)
    grouped_xyz = o_grouped_xyz - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feats = group(features, idx)               # (b, m, k, c)
        if nsample > 1:
            grouped_feats = grouped_feats - center_features[:, :, None, :]
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        else:
            new_features = grouped_feats
    else:
        assert use_xyz, "need features or use_xyz"
        new_features = grouped_xyz
    return GroupedEdgeFeatures(new_features, o_grouped_xyz, idx)


def query_and_group(
    xyz: jax.Array,
    new_xyz: Optional[jax.Array],
    features: Optional[jax.Array],
    *,
    nsample: int,
    radius: Optional[float] = None,
    use_xyz: bool = True,
    idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain (non-edge) query+group (reference ``QueryAndGroup``,
    pointops.py:476-516): grouped xyz centred on the query, grouped
    features NOT centred. Returns ``(b, m, k, 3 + c)``."""
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        if radius is not None:
            idx = ball_query(radius, nsample, xyz, new_xyz)
        else:
            idx = dilated_knn(xyz, new_xyz, nsample, 1)
    grouped_xyz = group(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feats = group(features, idx)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        return grouped_feats
    assert use_xyz
    return grouped_xyz


def group_all(xyz: jax.Array, features: Optional[jax.Array], use_xyz: bool = True) -> jax.Array:
    """Reference ``GroupAll`` (pointops.py:637-661): one group of all points.

    Returns ``(b, 1, n, 3 + c)`` channels-last.
    """
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped = features[:, None, :, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped], axis=-1)
        return grouped
    return grouped_xyz
