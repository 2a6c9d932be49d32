"""Point ops over clouds sharded across the device mesh.

The reference caps clouds at N=4096 on one GPU; the TPU-native scaling
story (SURVEY §5.7) shards the *point axis* of giant clouds over the
mesh and keeps the ops exact:

  - :func:`sharded_knn`: each device computes exact top-k against its
    point shard, per-shard candidates are all-gathered over ICI
    (k x n_dev small tables, not the distance matrix), and a final
    top-k merges them — the top-k of a union of per-shard top-ks is
    the global top-k, so the result is bit-identical to the
    single-device op.
  - :func:`sharded_fps`: the sequential sweep keeps each device's
    min-distance slice local; every step all-gathers one (value, index)
    candidate pair per device and reduces on all devices identically.

Both run under ``shard_map`` on any mesh, including the virtual-CPU
test mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.knn import knn as _knn
from ..ops.pairwise import pairwise_sqdist


def sharded_knn(
    xyz: jax.Array,
    new_xyz: jax.Array,
    k: int,
    mesh: Mesh,
    axis_name: str = "data",
    batch_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact kNN with the reference-point axis sharded over the mesh.

    Args:
      xyz: ``(b, n, 3)`` points; the n axis is sharded ``P(None, axis)``.
      new_xyz: ``(b, m, 3)`` queries, replicated along ``axis_name``.
      batch_axis: optional second mesh axis sharding the batch dim of
        both inputs (dp x sp composite on a 2D mesh: the per-shard
        all_gather then rides only the ``axis_name`` subgroups).
    Returns ``(idx, d2)`` identical to ``ops.knn`` (replicated along
    ``axis_name``, batch-sharded along ``batch_axis`` when given).
    """
    n = xyz.shape[1]
    n_dev = mesh.shape[axis_name]
    assert n % n_dev == 0, (n, n_dev)
    if batch_axis is not None:
        assert xyz.shape[0] % mesh.shape[batch_axis] == 0, (
            f"batch {xyz.shape[0]} not divisible by mesh axis "
            f"{batch_axis!r}={mesh.shape[batch_axis]}"
        )
    shard_n = n // n_dev

    def local(xyz_shard, queries):
        idx_l, d_l = _knn(xyz_shard, queries, min(k, shard_n))
        idx_g = idx_l + jax.lax.axis_index(axis_name) * shard_n
        # gather the tiny per-shard candidate tables over ICI
        d_all = jax.lax.all_gather(d_l, axis_name, axis=-1, tiled=True)
        idx_all = jax.lax.all_gather(idx_g, axis_name, axis=-1, tiled=True)
        neg, sel = jax.lax.top_k(-d_all, k)
        return jnp.take_along_axis(idx_all, sel, axis=-1), -neg

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis_name, None), P(batch_axis, None, None)),
        out_specs=(P(batch_axis, None, None), P(batch_axis, None, None)),
        check_vma=False,  # replicated post-all_gather (not statically inferable)
    )
    return fn(xyz, new_xyz)


def sharded_topk_neighbors(
    queries: jax.Array,
    database: jax.Array,
    k: int,
    mesh: Mesh,
    axis_name: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Descriptor retrieval with the database sharded over the mesh.

    For databases beyond one chip's HBM: each device holds a database
    shard, computes its exact top-k, and the per-shard candidates merge
    over ICI — identical results to
    :func:`patchaugnet_tpu.data.retrieval.topk_neighbors`.

    Args:
      queries: ``(q, d)`` replicated; database: ``(m, d)``, m axis
      sharded ``P(axis)``.
    Returns replicated ``(d2, idx)`` in ascending distance order.
    """
    idx, d2 = sharded_knn(
        database[None], queries[None], k, mesh, axis_name=axis_name
    )
    return d2[0], idx[0]


def sharded_gather(
    features: jax.Array,
    idx: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """Row gather by GLOBAL index from a point-sharded table.

    ``out[b, j, c] = features[b, idx[b, j], c]`` with the ``n`` axis of
    ``features`` sharded ``P(axis_name)`` and ``idx`` replicated along
    it. Exact vs :func:`patchaugnet_tpu.ops.gather`: each global row is
    owned by exactly one shard; non-owners contribute exact zeros and
    one ``psum`` over ICI assembles the rows (adding 0.0 is exact in
    f32, so the result is bit-identical regardless of reduction order).

    Args:
      features: ``(b, n, c)``; idx: ``(b, m)`` int32 in ``[0, n)``.
    Returns: ``(b, m, c)`` replicated along ``axis_name``.
    """
    from ..ops.grouping import gather as _gather

    n = features.shape[1]
    n_dev = mesh.shape[axis_name]
    assert n % n_dev == 0, (n, n_dev)
    shard_n = n // n_dev

    def local(f_shard, idx_rep):
        off = jax.lax.axis_index(axis_name) * shard_n
        loc = idx_rep - off
        ok = (loc >= 0) & (loc < shard_n)
        g = _gather(f_shard, jnp.clip(loc, 0, shard_n - 1).astype(jnp.int32))
        g = jnp.where(ok[..., None], g, jnp.zeros((), g.dtype))
        return jax.lax.psum(g, axis_name)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis_name, None), P(batch_axis, None)),
        out_specs=P(batch_axis, None, None),
        check_vma=False,
    )
    return fn(features, idx)


def sharded_group(
    features: jax.Array,
    idx: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """``out[b, j, s, c] = features[b, idx[b, j, s], c]`` — the grouped
    variant of :func:`sharded_gather` (``idx``: ``(b, m, k)``)."""
    b, m, k = idx.shape
    flat = sharded_gather(
        features, idx.reshape(b, m * k), mesh, axis_name, batch_axis
    )
    return flat.reshape(b, m, k, features.shape[-1])


def sharded_sa_level(
    mlp_apply,
    xyz: jax.Array,
    features: jax.Array,
    *,
    npoint: int,
    nsample: int,
    mesh: Mesh,
    axis_name: str = "points",
    batch_axis: Optional[str] = "data",
    use_xyz: bool = True,
    mlp_returns_aux: bool = False,
):
    """One FULL PointNet2 set-abstraction level with the point axis
    sharded over the mesh (SURVEY §5.7 made whole-layer, not per-op —
    VERDICT r4 next #5).

    Composition mirrors ``models.backbone.PointNet2SAModule`` exactly:
    sharded FPS -> sharded centre/feature gathers -> sharded exact kNN
    (= the exact-mode dilated kNN: the first k of the sorted k*d
    candidates are the k nearest, ops/knn.py:93-105) -> sharded
    neighbour grouping -> EdgeConv centring -> the model's own
    SharedMLP (``mlp_apply``, replicated: it runs on the (b, npoint, k)
    tables, which no longer scale with n) -> neighbour max-pool.
    Every geometry output is bit-identical to the single-device module
    (tests/test_train.py); only the n-scaling stages ride the mesh.

    Args:
      mlp_apply: ``(b, m, k, c_in) -> (b, m, k, c_out)`` — the SA
        level's SharedMLP bound with its parameters (eval mode). With
        ``mlp_returns_aux=True`` it instead returns ``(out, aux)`` —
        e.g. mutated train-mode batch stats (parallel/sharded_train.py;
        the MLP runs on replicated tables, so train stats need no sync).
      xyz: ``(b, n, 3)`` points, n sharded ``P(axis_name)``.
      features: ``(b, n, c)`` per-point features, sharded like xyz.
    Returns: ``(new_xyz, center_idx, sample_idx, pooled)`` matching
      ``SALevelOutput`` field order, plus ``aux`` when
      ``mlp_returns_aux=True``.
    """
    center_idx = sharded_fps(xyz, npoint, mesh, axis_name, batch_axis)
    new_xyz = sharded_gather(xyz, center_idx, mesh, axis_name, batch_axis)
    center_feats = sharded_gather(
        features, center_idx, mesh, axis_name, batch_axis
    )
    sample_idx, _ = sharded_knn(
        xyz, new_xyz, nsample, mesh, axis_name, batch_axis
    )
    grouped_xyz = sharded_group(xyz, sample_idx, mesh, axis_name, batch_axis)
    grouped_feats = sharded_group(
        features, sample_idx, mesh, axis_name, batch_axis
    )
    centered_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if nsample > 1:
        grouped_feats = grouped_feats - center_feats[:, :, None, :]
    if use_xyz:
        new_features = jnp.concatenate([centered_xyz, grouped_feats], axis=-1)
    else:
        new_features = grouped_feats
    if mlp_returns_aux:
        mlp_out, aux = mlp_apply(new_features)
        return new_xyz, center_idx, sample_idx, jnp.max(mlp_out, axis=2), aux
    pooled = jnp.max(mlp_apply(new_features), axis=2)
    return new_xyz, center_idx, sample_idx, pooled


def sharded_fps(
    xyz: jax.Array,
    m: int,
    mesh: Mesh,
    axis_name: str = "data",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """Exact FPS with the point axis sharded over the mesh.

    Identical indices to ``ops.farthest_point_sample``: first global
    index 0, ties to lowest index; each step exchanges one candidate
    (max min-distance value, index) per device. ``batch_axis``
    optionally shards the batch dim over a second mesh axis (dp x sp).
    """
    _, n, _ = xyz.shape
    n_dev = mesh.shape[axis_name]
    assert n % n_dev == 0, (n, n_dev)
    if batch_axis is not None:
        assert xyz.shape[0] % mesh.shape[batch_axis] == 0, (
            f"batch {xyz.shape[0]} not divisible by mesh axis "
            f"{batch_axis!r}={mesh.shape[batch_axis]}"
        )
    shard_n = n // n_dev

    def local(xyz_shard):
        b = xyz_shard.shape[0]                             # local batch rows
        dev = jax.lax.axis_index(axis_name)
        offset = dev * shard_n

        def body(i, state):
            min_d, idx = state
            last = idx[:, i - 1]                           # (b,) global index
            local_ix = last - offset
            in_shard = (local_ix >= 0) & (local_ix < shard_n)
            safe_ix = jnp.clip(local_ix, 0, shard_n - 1)
            last_pt = jnp.take_along_axis(
                xyz_shard, safe_ix[:, None, None], axis=1
            )                                              # (b, 1, 3)
            # every shard needs the selected point's coordinates: the
            # owning shard broadcasts them with a psum
            last_pt = jax.lax.psum(
                jnp.where(in_shard[:, None, None], last_pt, 0.0), axis_name
            )
            d = jnp.sum((xyz_shard - last_pt) ** 2, axis=-1)
            min_d = jnp.minimum(min_d, d)
            # local champion
            local_best = jnp.max(min_d, axis=-1)           # (b,)
            local_arg = jnp.argmax(min_d, axis=-1) + offset
            vals = jax.lax.all_gather(local_best, axis_name, axis=-1)  # (b, D)
            args = jax.lax.all_gather(local_arg, axis_name, axis=-1)
            # global max; ties -> lowest global index (shards are in
            # index order, so first max shard wins like argmax)
            best_dev = jnp.argmax(vals, axis=-1)
            nxt = jnp.take_along_axis(args, best_dev[:, None], axis=-1)[:, 0]
            idx = jax.lax.dynamic_update_index_in_dim(
                idx, nxt.astype(jnp.int32), i, axis=1
            )
            return min_d, idx

        min_d0 = jnp.full((b, shard_n), 1e10, jnp.float32)
        idx0 = jnp.zeros((b, m), jnp.int32)
        _, idx = jax.lax.fori_loop(1, m, body, (min_d0, idx0))
        return idx

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis_name, None),),
        out_specs=P(batch_axis, None),
        check_vma=False,  # every device reduces the gathered candidates
    )
    return fn(xyz)
