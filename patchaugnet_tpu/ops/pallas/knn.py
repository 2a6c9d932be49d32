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

(Fusion history: the fully fused variant computing distances in-kernel
from (qb, 1) x (1, n) coordinate broadcasts MISCOMPILED under round-1
Mosaic — last-dim-1 block relayouts produced wrong results on-chip
while interpret mode was exact — so rounds 1-4 shipped the split
XLA-distance + extraction path (a round-2 (qb, 8) @ (8, n) in-kernel
matmul rebuild was bit-exact but ~4% slower). Re-probed 2026-08-20 on
current Mosaic (`_probe_knn_pair.py` / `_probe_knn_fair.py`): the
broadcast pattern now compiles bit-exactly, and the fused kernel
(``knn_fused_pallas``) is 1.09x the split path at the level-1 shape
while never materialising the (b, m, n) distance matrix in HBM
(512 MB at B=32, m=1024, n=4096). ``knn_pallas`` dispatches to it for
3-d points at flat-tile scale; the split path remains for d != 3 and
as the chunked big-n fallback.)
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
    dist_ref[:, :] = dist_in[:, :]
    _extract_sweeps(k, idx_ref, d2_ref, dist_ref)


def _extract_sweeps(k, idx_ref, d2_ref, dist_ref):
    """k min-extraction sweeps over the populated ``dist_ref`` tile
    (the shared tail of the split and fused kernels): ascending value,
    lowest-index tie-break, extracted lanes masked to 1e30."""
    qb, n = dist_ref.shape
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


def _fused_knn_kernel(k, q0, q1, q2, y0, y1, y2, idx_ref, d2_ref, dist_ref):
    """Distance computation fused into the extraction kernel.

    ``q_c``: (qb, 1) query-coordinate columns; ``y_c``: (1, n) candidate
    rows. The (qb, 1) - (1, n) broadcast subtract reproduces
    ``ops.pairwise.pairwise_sqdist``'s d<=4 arithmetic bit-for-bit
    (zeros + per-coordinate diff^2 accumulated in the same order, then
    the max(., 0) clamp), so the fused path is bit-identical to
    split XLA-distance + ``topk_extract_pallas`` — while the (b, m, n)
    distance matrix never exists in HBM at all (512 MB written + read
    back at the level-1 shape).

    (Mosaic history: this exact (qb, 1) x (1, n) broadcast pattern
    MISCOMPILED under round-1 Mosaic — wrong results on-chip, exact in
    interpret mode — which is why the split path was built. Re-probed
    2026-08-20 (`_probe_knn_pair.py`): bit-exact on current Mosaic.)
    """
    acc = jnp.zeros(dist_ref.shape, jnp.float32)
    for q, y in ((q0, y0), (q1, y1), (q2, y2)):
        diff = q[:, :] - y[:, :]
        acc = acc + diff * diff
    dist_ref[:, :] = jnp.maximum(acc, 0.0)
    _extract_sweeps(k, idx_ref, d2_ref, dist_ref)


@partial(jax.jit, static_argnums=(2,), static_argnames=("query_block", "interpret"))
def knn_fused_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    k: int,
    query_block: int = 256,
    interpret: bool = False,
):
    """Exact kNN with the distance matrix computed inside the kernel.

    Same contract as :func:`knn_pallas` (ascending d^2, lowest-index
    ties) restricted to 3-coordinate points. Requires n to fit one
    VMEM tile row (the caller gates on ``_VMEM_TILE_BUDGET``).
    """
    b, n, dd = xyz.shape
    m = new_xyz.shape[1]
    assert dd == 3 and new_xyz.shape[-1] == 3, (xyz.shape, new_xyz.shape)
    qb = min(query_block, m)
    assert m % qb == 0, (m, qb)
    qs = [new_xyz[..., c][..., None].astype(jnp.float32) for c in range(3)]
    ys = [xyz[..., c][:, None, :].astype(jnp.float32) for c in range(3)]
    qspec = pl.BlockSpec((None, qb, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((None, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((None, qb, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fused_knn_kernel, k),
        grid=(b, m // qb),
        in_specs=[qspec] * 3 + [yspec] * 3,
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, m, k), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((qb, n), jnp.float32)],
        interpret=interpret,
    )(*qs, *ys)


def _extract_pair_kernel(k, dist_in, idx_ref, d2_ref, dist_ref):
    """``_extract_kernel`` unrolled two extractions per scratch round-trip.

    The flat kernel pays a full (qb, n) scratch read-modify-write per
    extracted neighbour; here the first extraction's mask is applied as
    an in-flight VALUE (``dm``) so the scratch tile is read and written
    once per TWO neighbours — identical f32 arithmetic and identical
    lowest-index tie-breaks by construction (``mn2``/``sel2`` reduce
    over exactly the tile the sequential kernel would have stored).
    For odd ``k`` the final pair's second extraction has no column to
    land in (``col == k`` never holds) and is dead work.
    """
    qb, n = dist_in.shape
    dist_ref[:, :] = dist_in[:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, k), 1)
    idx_ref[:, :] = jnp.zeros((qb, k), jnp.int32)
    d2_ref[:, :] = jnp.zeros((qb, k), jnp.float32)

    def body(t, _):
        j = t * 2
        d = dist_ref[:, :]
        mn1 = jnp.min(d, axis=1, keepdims=True)             # (qb, 1)
        sel1 = jnp.min(
            jnp.where(d == mn1, lane, jnp.int32(n)), axis=1, keepdims=True
        ).astype(jnp.int32)
        dm = jnp.where(lane == sel1, jnp.float32(1e30), d)
        mn2 = jnp.min(dm, axis=1, keepdims=True)
        sel2 = jnp.min(
            jnp.where(dm == mn2, lane, jnp.int32(n)), axis=1, keepdims=True
        ).astype(jnp.int32)
        idx_ref[:, :] = jnp.where(
            col == j, sel1, jnp.where(col == j + 1, sel2, idx_ref[:, :])
        )
        d2_ref[:, :] = jnp.where(
            col == j, mn1, jnp.where(col == j + 1, mn2, d2_ref[:, :])
        )
        dist_ref[:, :] = jnp.where(lane == sel2, jnp.float32(1e30), dm)
        return 0

    jax.lax.fori_loop(0, (k + 1) // 2, body, 0)


@partial(jax.jit, static_argnums=(1, 2), static_argnames=("query_block", "interpret"))
def topk_extract_pair_pallas(
    dist: jax.Array, k: int, query_block: int = 256, interpret: bool = False
):
    """:func:`topk_extract_pallas` via the pair-extraction kernel."""
    b, m, n = dist.shape
    qb = min(query_block, m)
    assert m % qb == 0, (m, qb)
    spec = pl.BlockSpec((None, qb, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((None, qb, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_extract_pair_kernel, k),
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

    3-d points at flat-tile scale take the FUSED kernel (distance
    computed in-kernel from (qb,1)x(1,n) coordinate broadcasts — the
    (b, m, n) distance matrix never touches HBM; bit-exact vs the split
    path on-chip, 1.09x at the level-1 shape, `_probe_knn_fair.py`).
    Other dims use XLA distance + flat extraction; the two-level
    chunked variant kicks in only when the flat (query_block x n) tile
    would blow the VMEM budget (chunking costs ~3x at n=4096 from grid
    overhead but scales to n >> 4096)."""
    n = xyz.shape[-2]
    m = new_xyz.shape[-2]
    qb = min(query_block, m)
    flat_ok = qb * n <= _VMEM_TILE_BUDGET
    if flat_ok and xyz.shape[-1] == 3 and m % qb == 0:
        return knn_fused_pallas(
            xyz, new_xyz, k, query_block=query_block, interpret=interpret
        )
    d = pairwise_sqdist(new_xyz, xyz)
    if not flat_ok:
        return topk_extract_chunked(d, k, query_block, interpret=interpret)
    return topk_extract_pallas(d, k, query_block, interpret=interpret)
