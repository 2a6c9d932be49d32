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
