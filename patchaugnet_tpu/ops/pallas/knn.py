"""Pallas exact-kNN selection kernel.

Replaces ``lax.top_k`` for the SA-level grouping shapes: top_k lowers to
a full bitonic sort of every candidate row (~70 ms at B=32, m=1024,
n=4096, k=40 on v5e). Here the squared-distance matrix comes from one
XLA MXU contraction (cheap, ~3 ms) and the k nearest are peeled off by
a Pallas kernel that keeps each (query-block x n) distance tile
resident in VMEM and runs k min-extraction sweeps — one HBM pass
instead of a sort. ~6x faster end to end.

Matches ``ops.knn`` exactly: ascending distance, ties resolve to the
lowest candidate index.

(Fusion history: a fully fused variant computing distances in-kernel
from (qb, 1) x (1, n) coordinate blocks miscompiles under current
Mosaic — last-dim-1 block relayouts produce wrong results while
interpret mode is exact. Round 2 rebuilt it with 8-sublane-padded
coordinates and a real (qb, 8) @ (8, n) in-kernel matmul: bit-exact
against this split path on-chip (indices AND distances), but ~4%
SLOWER at the level-1 shape — the tiny per-block matmul serializes
with the VPU extraction sweeps, while the split path's one big XLA
matmul pipelines against the extraction kernel's double-buffered HBM
reads. The extraction ALU dominates either way, so the split stays.)
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pairwise import pairwise_sqdist


def _extract_kernel(k, dist_in, idx_ref, d2_ref, dist_ref):
    qb, n = dist_in.shape
    dist_ref[:, :] = dist_in[:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, k), 1)
    idx_ref[:, :] = jnp.zeros((qb, k), jnp.int32)
    d2_ref[:, :] = jnp.zeros((qb, k), jnp.float32)

    def body(j, _):
        d = dist_ref[:, :]
        mn = jnp.min(d, axis=1, keepdims=True)              # (qb, 1)
        sel = jnp.min(
            jnp.where(d == mn, lane, jnp.int32(n)), axis=1, keepdims=True
        ).astype(jnp.int32)
        idx_ref[:, :] = jnp.where(col == j, sel, idx_ref[:, :])
        d2_ref[:, :] = jnp.where(col == j, mn, d2_ref[:, :])
        dist_ref[:, :] = jnp.where(lane == sel, jnp.float32(1e30), d)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@partial(jax.jit, static_argnums=(1, 2), static_argnames=("query_block", "interpret"))
def topk_extract_pallas(
    dist: jax.Array, k: int, query_block: int = 256, interpret: bool = False
):
    """k smallest per row of ``(b, m, n)`` -> ``(idx, val) (b, m, k)``."""
    b, m, n = dist.shape
    qb = min(query_block, m)
    assert m % qb == 0, (m, qb)
    spec = pl.BlockSpec((None, qb, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((None, qb, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_extract_kernel, k),
        grid=(b, m // qb),
        in_specs=[spec],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, m, k), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((qb, n), jnp.float32)],
        interpret=interpret,
    )(dist.astype(jnp.float32))


def _extract_price_kernel(k, base_in, price_in, idx_ref, d2_ref, dist_ref):
    """``_extract_kernel`` with the auction price folded in-kernel.

    ``base_in`` is a (qb, n) tile of the iteration-invariant negated
    value base (``dist - 3.0``); ``price_in`` is the (1, n) price row of
    this batch element, broadcast over the qb sublanes. Computing
    ``base + price`` here instead of in XLA means the (b, n, n) base
    streams HBM->VMEM once per auction iteration with no materialised
    ``value`` tensor round-trip (the price vector is the only thing that
    changes between iterations).
    """
    qb, n = base_in.shape
    dist_ref[:, :] = base_in[:, :] + price_in[:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, k), 1)
    idx_ref[:, :] = jnp.zeros((qb, k), jnp.int32)
    d2_ref[:, :] = jnp.zeros((qb, k), jnp.float32)

    def body(j, _):
        d = dist_ref[:, :]
        mn = jnp.min(d, axis=1, keepdims=True)              # (qb, 1)
        sel = jnp.min(
            jnp.where(d == mn, lane, jnp.int32(n)), axis=1, keepdims=True
        ).astype(jnp.int32)
        idx_ref[:, :] = jnp.where(col == j, sel, idx_ref[:, :])
        d2_ref[:, :] = jnp.where(col == j, mn, d2_ref[:, :])
        dist_ref[:, :] = jnp.where(lane == sel, jnp.float32(1e30), d)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _extract_price2_kernel(base_in, price_in, idx_ref, d2_ref):
    """k=2 specialisation of :func:`_extract_price_kernel`.

    The generic kernel costs ~8 full-tile VPU passes (scratch store,
    two min+argmin sweeps, a masked write-back per extraction); the
    on-chip EMD attribution probe (round 4) measured it VPU-bound at
    3.4x the HBM streaming floor. For the auction's k=2 this collapses
    to four reduction passes with no scratch traffic at all — the
    masked ``1e30`` second extraction is computed as a value instead of
    written back, with identical f32 arithmetic and the identical
    lowest-index tie-break (``where(d == mn, lane, n)`` then min).
    """
    qb, n = base_in.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, 2), 1)
    d = base_in[:, :] + price_in[:, :]
    mn1 = jnp.min(d, axis=1, keepdims=True)                  # (qb, 1)
    sel1 = jnp.min(
        jnp.where(d == mn1, lane, jnp.int32(n)), axis=1, keepdims=True
    ).astype(jnp.int32)
    dm = jnp.where(lane == sel1, jnp.float32(1e30), d)
    mn2 = jnp.min(dm, axis=1, keepdims=True)
    sel2 = jnp.min(
        jnp.where(dm == mn2, lane, jnp.int32(n)), axis=1, keepdims=True
    ).astype(jnp.int32)
    idx_ref[:, :] = jnp.where(col == 0, sel1, sel2)
    d2_ref[:, :] = jnp.where(col == 0, mn1, mn2)


@partial(jax.jit, static_argnums=(2, 3), static_argnames=("query_block", "interpret"))
def topk_extract_price_pallas(
    neg_base: jax.Array,
    price: jax.Array,
    k: int,
    query_block: int = 256,
    interpret: bool = False,
):
    """k smallest per row of ``neg_base + price[:, None, :]``.

    ``neg_base``: (b, m, n) iteration-invariant term; ``price``: (b, n)
    per-column offset. Returns ``(idx, val)`` of shape (b, m, k) with
    the same ascending-value / lowest-index tie-break semantics as
    ``topk_extract_pallas`` — bit-identical to extracting from the
    materialised sum (the f32 add is performed identically, just in
    VMEM). Built for the auction-EMD value sweep (ops/emd.py), where
    re-materialising (b, n, n) values every iteration costs 2x the HBM
    traffic of streaming the fixed base.
    """
    b, m, n = neg_base.shape
    assert price.shape == (b, n), (price.shape, (b, n))
    qb = min(query_block, m)
    assert m % qb == 0, (m, qb)
    spec = pl.BlockSpec((None, qb, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((None, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((None, qb, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    if k == 2:
        kernel, scratch = _extract_price2_kernel, []
    else:
        kernel = partial(_extract_price_kernel, k)
        scratch = [pltpu.VMEM((qb, n), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(b, m // qb),
        in_specs=[spec, pspec],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, m, k), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(neg_base.astype(jnp.float32), price.astype(jnp.float32)[:, None, :])


def topk_extract_chunked(
    dist: jax.Array,
    k: int,
    query_block: int = 256,
    num_chunks: Optional[int] = None,
    interpret: bool = False,
):
    """Two-level exact k-smallest: per-chunk extraction then a merge
    extraction over the ``num_chunks * k`` survivors.

    Sweep cost per row drops from ``k * n`` to ``k * (n/C + C*k)``
    (minimised near ``C = sqrt(n/k)``) while staying exact: the top-k of
    a union of per-chunk top-ks is the global top-k, and candidate list
    order (chunk-major, rank-minor) preserves lowest-global-index
    tie-breaking.
    """
    b, m, n = dist.shape
    if num_chunks is None:
        num_chunks = max(int(round((n / max(k, 1)) ** 0.5)), 1)
        while num_chunks > 1 and n % num_chunks:
            num_chunks -= 1
    c = num_chunks
    if c <= 1 or n % c or n // c < k:
        return topk_extract_pallas(dist, k, query_block, interpret=interpret)
    sub = n // c
    d4 = dist.reshape(b, m * c, sub)                       # chunk-major rows
    qb1 = query_block
    while (m * c) % qb1:
        qb1 //= 2
    li, lv = topk_extract_pallas(d4, k, qb1, interpret=interpret)
    li = li.reshape(b, m, c, k)
    offsets = (jnp.arange(c, dtype=jnp.int32) * sub)[None, None, :, None]
    cand_idx = (li + offsets).reshape(b, m, c * k)
    cand_val = lv.reshape(b, m, c * k)
    mi, mv = topk_extract_pallas(cand_val, k, query_block, interpret=interpret)
    idx = jnp.take_along_axis(cand_idx, mi, axis=-1)
    return idx, mv


# flat (qb, n) f32 tile + double-buffered input must fit scoped VMEM
_VMEM_TILE_BUDGET = 4 * 1024 * 1024 // 4                   # floats


def knn_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    k: int,
    query_block: int = 256,
    interpret: bool = False,
):
    """Exact kNN: ``(b, n, 3) x (b, m, 3) -> idx (b, m, k), d2 (b, m, k)``.

    Flat extraction for reference-scale n (fastest: 13 ms at B=32,
    m=1024, n=4096, k=40); the two-level chunked variant kicks in only
    when the flat (query_block x n) tile would blow the VMEM budget
    (chunking costs ~3x at n=4096 from grid overhead but scales to
    n >> 4096)."""
    d = pairwise_sqdist(new_xyz, xyz)
    n = d.shape[-1]
    qb = min(query_block, d.shape[-2])
    if qb * n > _VMEM_TILE_BUDGET:
        return topk_extract_chunked(d, k, query_block, interpret=interpret)
    return topk_extract_pallas(d, k, query_block, interpret=interpret)
