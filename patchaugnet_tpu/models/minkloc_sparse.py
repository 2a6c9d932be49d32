"""MinkLoc3Dv2 at the reference's native quantization — sparse voxel
tables + gather convolution.

The dense-voxel branch (:mod:`minkloc3dv2`) is sparse-equivalent but
memory-bound to ~48^3 grids; the reference's cartesian config quantizes
at step 0.01 over unit-sphere clouds (~201 cells/dim,
/root/reference/place_recognition/Minkloc3D_V2/misc/quantization.py:40-50
with quantization_step=0.01 from models/minkloc3dv2.txt), i.e. a ~8M-
voxel level-0 lattice of which at most N=4096 voxels are occupied.

TPU-native sparse convolution (this module): keep only the occupied
voxels in a **fixed-capacity sorted key table** and turn every
Minkowski convolution into *neighbour-offset gathers feeding MXU
matmuls*:

  - voxelize: integer coords -> flat int32 keys -> sort; duplicates are
    re-keyed to a SENTINEL and compacted by a second sort. All shapes
    static (capacity = N, since N points occupy <= N voxels and
    downsampling never grows the count).
  - kernel map: for each voxel and each of the K = k^3 kernel offsets,
    the neighbour's table slot is found by vectorised binary search
    (``jnp.searchsorted``) into the sorted keys — the TPU answer to
    MinkowskiEngine's GPU coordinate hash map.
  - convolution: ``out = sum_o gather(feats, nbr[o]) @ W[o]`` — K row
    gathers (ops.grouping.gather, the repo's flat row-gather) each fused
    into a ``(B*V, Cin) x (Cin, Cout)`` matmul; for tiny Cin the K
    gathers concatenate into one im2col matmul instead. Missing
    neighbours are masked to zero, which is exactly the sparse conv sum.
  - stride-2 downsample (kernel 2): coarse coords = unique(fine//2),
    children at ``2p + q`` for the 8 offsets q — same gather-conv.
  - transposed conv (kernel 2, stride 2): ME reuses the bottom-up
    coordinate map at the output stride, so each fine site takes exactly
    one contribution ``W[1 - (f mod 2)] @ coarse[f // 2]`` (the flipped
    kernel orientation matches flax ``nn.ConvTranspose`` — probed
    empirically — so dense and sparse branches share parameters).

Parameter tree, module names, and kernel shapes are IDENTICAL to the
dense branch (``backbone/{conv0,down{i},block{i}_{j},lateral{i},
tconv{i}}``, kernels ``(k,k,k,Cin,Cout)``), so
``compat.torch_loader.convert_minkloc3dv2`` and the INI/YAML configs
serve both; tests/test_minkloc_sparse.py proves dense-vs-sparse
bit-level agreement at stored sites with shared parameters.

Reference parity anchors: MinkFPN topology minkfpn.py:9-93, blocks
layers/eca_block.py:12-72, poolings layers/pooling.py:11-85, quantizers
misc/quantization.py:14-50 (cartesian: ``floor(p/step)`` like
ME.sparse_quantize; polar: degrees/rings/z with per-axis steps).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import l2_normalize
from ..ops.grouping import gather
from .minkloc3dv2 import ECALayer, MaskedBatchNorm, MaskedPooling

SENTINEL = jnp.iinfo(jnp.int32).max

Dims = Tuple[int, int, int]


# ------------------------------------------------------------ tables
class VoxelTable(NamedTuple):
    """Fixed-capacity sorted voxel table for one pyramid level."""

    keys: jax.Array   # (B, V) int32, ascending, SENTINEL-padded
    mask: jax.Array   # (B, V) bool — slot holds a stored voxel


def compose_keys(coords: jax.Array, dims: Dims) -> jax.Array:
    """Flatten integer coords ``(..., 3)`` to scalar keys (row-major)."""
    return (coords[..., 0] * dims[1] + coords[..., 1]) * dims[2] + coords[..., 2]


def decompose_keys(keys: jax.Array, dims: Dims) -> jax.Array:
    """Inverse of :func:`compose_keys` (garbage for SENTINEL slots —
    callers mask)."""
    c2 = keys % dims[2]
    r = keys // dims[2]
    return jnp.stack([r // dims[1], r % dims[1], c2], axis=-1)


def build_table(coords: jax.Array, valid: jax.Array, dims: Dims) -> VoxelTable:
    """Unique-compact integer coords ``(B, N, 3)`` into a sorted table.

    Sort once, re-key duplicates (and invalid rows) to SENTINEL, sort
    again: unique keys land at the front, padding at the back. Static
    shapes throughout — capacity is N.
    """
    keys = jnp.where(valid, compose_keys(coords, dims), SENTINEL)
    keys = jnp.sort(keys, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(keys[:, :1], bool), keys[:, 1:] == keys[:, :-1]], axis=-1
    )
    keys = jnp.sort(jnp.where(dup, SENTINEL, keys), axis=-1)
    return VoxelTable(keys=keys, mask=keys != SENTINEL)


_RANK_CLAMP = 1 << 29   # voxel keys must stay below this (dims product)


def lookup(table_keys: jax.Array, queries: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Find each query key's slot in the sorted table — sort-rank merge.

    TPU-native strategy: every per-element random access is hostile on
    this hardware (~9 ns/element XLA gathers: a 13-step vmapped binary
    search cost ~5 s/batch, and even one flat probe per query costs
    ~140 ms at 16M queries — round-3 device traces). The only fast
    primitives at this scale are **sorts and scans**, so the search is
    recast as a merge:

      1. sort the concatenation of keys and queries by packed
         ``val*2 + tag`` (tag 1 = key, so equal-valued queries sort
         first — ``side='left'`` semantics) with an int32 payload;
      2. a query's slot = exclusive cumsum of the key-tag (count of
         keys strictly before it);
      3. membership = "next key value at-or-after equals the query",
         a reverse ``cummin`` over key values;
      4. a second sort by payload restores query order (cheaper than a
         per-element scatter).

    Two 2-operand int32 sorts + two scans: ~25 ms per 114k-query map
    vs ~470 ms for ``vmap(searchsorted)`` at the same shape.

    Args:
      table_keys: ``(B, V)`` sorted keys (SENTINEL-padded, unique).
      queries: ``(B, Q)`` keys (SENTINEL allowed).
    Returns: ``(slot (B, Q) int32 clipped to range, found (B, Q) bool)``.
    """
    rank, found = lookup_rank(table_keys, queries)
    return jnp.clip(rank, 0, table_keys.shape[1] - 1), found


def lookup_rank(
    table_keys: jax.Array, queries: jax.Array, with_found: bool = True
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """:func:`lookup` returning the raw insertion rank in ``[0, V]``
    (count of keys strictly below the query — the anchor the z-run
    window machinery needs even when the query itself is absent).

    ``with_found=False`` skips the membership bit (returns ``None`` for
    it): the routed-conv pyramid only needs ranks — presence resolves
    later from the window-key compares — and dropping ``found`` removes
    the reverse ``cummin`` scan from the map build's hot path."""
    b, v = table_keys.shape
    q = queries.shape[1]
    kv = jnp.minimum(table_keys, _RANK_CLAMP)       # pad keys sort last
    qv = jnp.minimum(queries, _RANK_CLAMP - 1)
    skey = jnp.concatenate([kv * 2 + 1, qv * 2], axis=1)
    payload = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.arange(q, q + v, dtype=jnp.int32), (b, v)),
            jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32), (b, q)),
        ],
        axis=1,
    )
    svals, spay = jax.lax.sort((skey, payload), num_keys=1, dimension=1)
    tag = svals & 1                                  # 1 = key element
    rank = jnp.cumsum(tag, axis=1) - tag             # keys strictly before
    if with_found:
        keyval = jnp.where(tag == 1, svals >> 1, _RANK_CLAMP)
        nextkey = jax.lax.cummin(keyval, axis=1, reverse=True)
        found = (tag == 0) & (nextkey == (svals >> 1))
        packed = rank | (found.astype(jnp.int32) << 30)
    else:
        packed = rank
    _, spacked = jax.lax.sort((spay, packed), num_keys=1, dimension=1)
    out = spacked[:, :q]
    pos = (out & ((1 << 30) - 1)).astype(jnp.int32)
    if not with_found:
        return pos, None
    return pos, ((out >> 30) & 1).astype(bool) & (queries != SENTINEL)


def lookup_rank_pairs(
    table_keys: jax.Array, coffs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Insertion ranks of ``keys ± c`` for P positive key shifts — both
    signs from ONE merge per shift.

    The stride-1 conv map's column-centre queries are the table's own
    keys shifted by a constant per xy offset (``qc = key + c_o``), so
    each (+o, -o) offset pair needs only one sorted merge of
    ``(keys, keys + c)``:

      * rank of ``keys[v] + c``   (the +o column) = keys strictly below
        the query — the forward count at query positions;
      * rank of ``keys[v] - c``   (the -o column) = ``#{i: keys[i] + c
        < keys[v]}`` — the strict query count at key positions (the
        merge packs equal-valued queries first, so the at-or-below
        count is corrected by one exactly when the immediately
        preceding merged element is an equal-valued query).

    vs :func:`lookup_rank` this halves the query columns AND drops the
    bitonic width from one (V + Kxy*V)-element sort to P batched
    2V-element sorts (level-0 map at the reference config: 131072-pad
    289-stage -> 12x8192-row 169-stage, both directions included) —
    the map-build sorts were 40% of the sparse forward (round-4
    on-chip component profile).

    Queries are formed UNMASKED (no xy-bounds SENTINEL): out-of-bounds
    columns get arithmetic ranks instead of rank-of-SENTINEL, which is
    safe because routing matches against the separately masked
    ``zmap.qc`` (SENTINEL + dz never equals a window key) and any
    spurious ``anchor + r == V`` edge match routes a zero-padded
    shift-ext row (contribution 0; covered by the anchor-clip tests).

    Args:
      table_keys: ``(B, V)`` sorted unique keys, SENTINEL-padded.
      coffs: ``(P,)`` int32 positive key shifts (< 2^29).
    Returns: ``(fwd (B, P, V), rev (B, P, V))`` raw ranks in [0, V].
    """
    b, v = table_keys.shape
    p = coffs.shape[0]
    kv = jnp.minimum(table_keys, _RANK_CLAMP)
    # clamp: a query >= 2^29-1 exceeds every valid key either way
    qv = jnp.minimum(kv[:, None, :] + coffs[None, :, None], _RANK_CLAMP - 1)
    kb = jnp.broadcast_to(kv[:, None, :], (b, p, v))
    skey = jnp.concatenate([kb * 2 + 1, qv * 2], axis=-1)      # (B, P, 2V)
    payload = jnp.broadcast_to(
        jnp.arange(2 * v, dtype=jnp.int32), (b, p, 2 * v)
    )
    svals, spay = jax.lax.sort((skey, payload), num_keys=1, dimension=2)
    tag = svals & 1                                  # 1 = key element
    val = svals >> 1
    rank_fwd = jnp.cumsum(tag, axis=-1) - tag        # keys strictly before
    csq = jnp.cumsum(1 - tag, axis=-1) - (1 - tag)   # queries at-or-before
    prev_val = jnp.concatenate(
        [jnp.full_like(val[..., :1], -1), val[..., :-1]], axis=-1
    )
    prev_tag = jnp.concatenate(
        [jnp.ones_like(tag[..., :1]), tag[..., :-1]], axis=-1
    )
    eq = (tag == 1) & (prev_tag == 0) & (prev_val == val)
    packed = jnp.where(tag == 1, csq - eq, rank_fwd)
    _, spacked = jax.lax.sort((spay, packed), num_keys=1, dimension=2)
    return spacked[..., v:], spacked[..., :v]


def downsample_with_ranks(
    table: VoxelTable, dims: Dims
) -> Tuple[VoxelTable, Dims, jax.Array]:
    """Stride-2 coordinate map that also yields each fine site's coarse
    slot (``parent_rank``) — the down map and the tconv map are then
    scatter/broadcast reads of these ranks instead of rank-merge
    lookups (4V- and V-query sorts per level, eliminated).

    Note halved keys of sorted fine keys are NOT sorted (halving can
    merge distinct x values and flip the (y, z) tiebreak — e.g. fine
    (6,5,4) < (7,0,4) but coarse (3,2,2) > (3,0,2)), so this costs one
    V-element payload sort + one V-element compaction sort — still far
    below the (V + Q)-element merges it replaces (V = 4096 pads to a
    144-stage bitonic; the old level-0 merged sort padded to 131072 at
    289 stages).

    Returns ``(coarse, cdims, parent_rank (B, V) int32)`` — garbage
    ranks on invalid fine slots (mask downstream).
    """
    coords = decompose_keys(table.keys, dims)
    cdims = tuple((d + 1) // 2 for d in dims)
    ck = jnp.where(table.mask, compose_keys(coords // 2, cdims), SENTINEL)
    b, v = ck.shape
    iota = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (b, v))
    sk, pay = jax.lax.sort((ck, iota), num_keys=1, dimension=1)
    prev = jnp.concatenate([jnp.full_like(sk[:, :1], -1), sk[:, :-1]], axis=1)
    new = (sk != prev) & (sk != SENTINEL)
    crank = jnp.cumsum(new.astype(jnp.int32), axis=1) - 1
    ckeys = jnp.sort(jnp.where(new, sk, SENTINEL), axis=-1)
    _, parent_rank = jax.lax.sort((pay, crank), num_keys=1, dimension=1)
    return (
        VoxelTable(keys=ckeys, mask=ckeys != SENTINEL),
        cdims,
        parent_rank.astype(jnp.int32),
    )


def upsample_from_ranks(
    parent_rank: jax.Array, fine: VoxelTable, fine_dims: Dims, vc: int
) -> Tuple[jax.Array, jax.Array]:
    """:func:`upsample_parent_table` from the downsample's parent ranks
    (zero lookups): every valid fine site's parent exists by
    construction, and the flipped-q kernel slot comes from the fine
    coords. Returns ``(idx (B, V, 8), valid (B, V, 8))``.

    ``parent_rank < vc`` guards the capacity-compacted pyramid: when a
    coarse level overflows its static capacity, the dropped (highest-
    key) parents' children take a ZERO tconv contribution instead of
    silently reading the clamped last row."""
    coords = decompose_keys(fine.keys, fine_dims)
    q = coords % 2
    qflip = 1 - q
    qi = (qflip[..., 0] * 2 + qflip[..., 1]) * 2 + qflip[..., 2]
    onehot = qi[..., None] == jnp.arange(8)
    valid = onehot & (fine.mask & (parent_rank < vc))[..., None]
    idx = jnp.broadcast_to(
        jnp.clip(parent_rank, 0, vc - 1)[..., None], valid.shape
    )
    return idx, valid


def _kernel_offsets(kernel_size: int) -> jax.Array:
    """(k^3, 3) offsets in dense-kernel order: index q maps to offset
    ``q - (k-1)//2`` per dim (flax ``nn.Conv`` SAME orientation, probed:
    kernel[q] multiplies input[p + q - center])."""
    c = (kernel_size - 1) // 2
    r = jnp.arange(kernel_size) - c
    gi, gj, gk = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([gi.ravel(), gj.ravel(), gk.ravel()], axis=-1).astype(jnp.int32)


def conv_neighbor_table(
    table: VoxelTable, dims: Dims, kernel_size: int
) -> Tuple[jax.Array, jax.Array]:
    """Stride-1 kernel map: ``(idx (B, V, K), valid (B, V, K))`` with K =
    kernel_size^3 in dense-kernel offset order (reference/oracle path —
    the FPN itself uses the z-run maps below)."""
    coords = decompose_keys(table.keys, dims)                # (B, V, 3)
    offs = _kernel_offsets(kernel_size)                       # (K, 3)
    nc = coords[:, :, None, :] + offs[None, None]             # (B, V, K, 3)
    dims_a = jnp.asarray(dims, jnp.int32)
    inb = jnp.all((nc >= 0) & (nc < dims_a), axis=-1) & table.mask[:, :, None]
    qk = jnp.where(inb, compose_keys(nc, dims), SENTINEL)
    b, v, k = qk.shape
    idx, found = lookup(table.keys, qk.reshape(b, v * k))
    return idx.reshape(b, v, k), found.reshape(b, v, k)


class ZRunMap(NamedTuple):
    """Anchor + expected-key map: the intermediate between the
    rank-merge lookups and the routed source table
    (:func:`routes_from_zmap`) the convs actually consume.

    Row-major voxel keys make the z-neighbours of a site *consecutive
    integers*, so all k z-offsets of one (dx, dy) column live within a
    k-row window of the sorted table around the insertion rank of the
    column's centre key (integer keys: at most (k-1)//2 present keys
    below/above the centre fit between the expected values). Only
    centre keys are rank-searched — the rank-merge sorts shrink
    k-fold, and the per-tap positions resolve with cheap int compares
    inside the window.

    anchor: (B, V, Kxy) int32 — insertion rank of each column centre,
      clipped to [0, V-1].
    qc: (B, V, Kxy) int32 — column-centre keys, SENTINEL for invalid /
      out-of-bounds columns. Expected neighbour keys are computed
      in-register as ``qc + dz`` (never materialized: the (B, V, Kxy, L)
      expected-key tensor was the map build's largest select traffic).
      SENTINEL + dz wraps far outside the valid key range [0, 2^29), so
      invalid columns can never match a window key.
    z_ok: (B, V, L) bool — site z + dz within the grid (without it,
      ``qc + dz`` past a z edge aliases the ADJACENT xy column's key,
      which may genuinely be present).
    """

    anchor: jax.Array
    qc: jax.Array
    z_ok: jax.Array


def _xy_offsets(kernel_size: int) -> jax.Array:
    c = (kernel_size - 1) // 2
    r = jnp.arange(kernel_size) - c
    ga, gb = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ga.ravel(), gb.ravel()], axis=-1).astype(jnp.int32)


def _zrun_conv_queries(
    table: VoxelTable, dims: Dims, kernel_size: int
) -> Tuple[jax.Array, jax.Array]:
    """Column-centre queries + z-validity for a stride-1 map.

    Returns ``(qc (B, V, Kxy) keys with SENTINEL for invalid columns,
    z_ok (B, V, L))`` — the lookup-independent half of
    :func:`zrun_conv_map`, split out so :func:`build_pyramid` can merge
    the rank-sort with the same level's down map."""
    h = (kernel_size - 1) // 2
    coords = decompose_keys(table.keys, dims)                 # (B, V, 3)
    offs = _xy_offsets(kernel_size)                           # (Kxy, 2)
    nxy = coords[:, :, None, :2] + offs[None, None]           # (B, V, Kxy, 2)
    dims_a = jnp.asarray(dims[:2], jnp.int32)
    ok = jnp.all((nxy >= 0) & (nxy < dims_a), axis=-1) & table.mask[:, :, None]
    z = coords[..., 2]
    qc = (nxy[..., 0] * dims[1] + nxy[..., 1]) * dims[2] + z[:, :, None]
    qc = jnp.where(ok, qc, SENTINEL)
    dz = jnp.arange(-h, h + 1, dtype=jnp.int32)
    z_ok = (z[:, :, None] + dz >= 0) & (z[:, :, None] + dz < dims[2])
    return qc, z_ok


def _zmap_from_rank(
    rank: jax.Array, qc: jax.Array, z_ok: jax.Array, v: int
) -> ZRunMap:
    return ZRunMap(
        anchor=jnp.clip(rank, 0, v - 1).reshape(qc.shape),
        qc=qc,
        z_ok=z_ok,
    )


def zrun_conv_map(table: VoxelTable, dims: Dims, kernel_size: int) -> ZRunMap:
    """Stride-1 kernel map in z-run form: Kxy = k^2 columns, L = k."""
    b, v = table.keys.shape
    qc, z_ok = _zrun_conv_queries(table, dims, kernel_size)
    rank, _ = lookup_rank(table.keys, qc.reshape(b, -1), with_found=False)
    return _zmap_from_rank(rank, qc, z_ok, v)


def downsample_table(table: VoxelTable, dims: Dims) -> Tuple[VoxelTable, Dims]:
    """Stride-2 coordinate map: coarse keys = unique(fine // 2)."""
    coords = decompose_keys(table.keys, dims)
    cdims = tuple((d + 1) // 2 for d in dims)
    return build_table(coords // 2, table.mask, cdims), cdims


def _zrun_down_queries(
    coarse: VoxelTable, cdims: Dims, fine_dims: Dims
) -> Tuple[jax.Array, jax.Array]:
    """Column-centre queries + z-validity for a kernel-2 stride-2
    children map (lookup-independent half of :func:`zrun_down_map`)."""
    ccoords = decompose_keys(coarse.keys, cdims)
    r = jnp.arange(2, dtype=jnp.int32)
    ga, gb = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([ga.ravel(), gb.ravel()], axis=-1)       # (4, 2)
    nxy = ccoords[:, :, None, :2] * 2 + offs[None, None]      # (B, V, 4, 2)
    dims_a = jnp.asarray(fine_dims[:2], jnp.int32)
    ok = jnp.all(nxy < dims_a, axis=-1) & coarse.mask[:, :, None]
    z = ccoords[..., 2] * 2
    qc = (nxy[..., 0] * fine_dims[1] + nxy[..., 1]) * fine_dims[2] + z[:, :, None]
    qc = jnp.where(ok, qc, SENTINEL)
    dz = jnp.arange(2, dtype=jnp.int32)
    z_ok = z[:, :, None] + dz < fine_dims[2]
    return qc, z_ok


def zrun_down_map(
    coarse: VoxelTable, cdims: Dims, fine: VoxelTable, fine_dims: Dims
) -> ZRunMap:
    """Kernel-2 stride-2 children map in z-run form: Kxy = 4 columns
    (qa, qb in {0,1}, dense-kernel order), L = 2 (children 2p + {0,1})."""
    b = coarse.keys.shape[0]
    qc, z_ok = _zrun_down_queries(coarse, cdims, fine_dims)
    rank, _ = lookup_rank(fine.keys, qc.reshape(b, -1), with_found=False)
    return _zmap_from_rank(rank, qc, z_ok, fine.keys.shape[1])


def upsample_parent_table(
    fine: VoxelTable, fine_dims: Dims, coarse: VoxelTable
) -> Tuple[jax.Array, jax.Array]:
    """Generative-tconv map onto the bottom-up fine coordinate set.

    ME's ConvolutionTranspose reuses the cached coordinate map at the
    output stride (the bottom-up map), so fine site f receives exactly
    ``W[1 - (f mod 2)] @ coarse[f // 2]`` (flipped orientation probed on
    flax ``nn.ConvTranspose`` k=2 s=2: out[2p+q] = K[1-q] @ in[p]).

    Returns ``(idx (B, V, 8), valid (B, V, 8))`` with at most one valid
    offset slot per fine site — reuses the same per-offset conv.
    """
    coords = decompose_keys(fine.keys, fine_dims)
    cdims = tuple((d + 1) // 2 for d in fine_dims)
    parent_key = compose_keys(coords // 2, cdims)
    parent_key = jnp.where(fine.mask, parent_key, SENTINEL)
    pidx, found = lookup(coarse.keys, parent_key)             # (B, V)
    q = coords % 2
    qflip = 1 - q
    qi = (qflip[..., 0] * 2 + qflip[..., 1]) * 2 + qflip[..., 2]   # (B, V)
    onehot = qi[..., None] == jnp.arange(8)                   # (B, V, 8)
    valid = onehot & (found & fine.mask)[..., None]
    idx = jnp.broadcast_to(pidx[..., None], valid.shape)
    return idx, valid


# -------------------------------------------------------- quantizers
def quantize_cartesian(
    points: jax.Array, step: float, extent: float = 1.0, align: int = 16
) -> Tuple[jax.Array, jax.Array, Dims]:
    """``floor(p/step)`` like ME.sparse_quantize (quantization.py:47),
    shifted non-negative. Returns (coords (B,N,3) int32, valid, dims).

    The shift is rounded up to a multiple of ``align`` (= 2^num_levels):
    ME's stride-2 maps floor-halve the RAW (possibly negative) coords,
    and a shift divisible by 2^s keeps ``floor((c + shift)/2^s) =
    floor(c/2^s) + shift/2^s`` at every pyramid level — with the old
    shift of ceil(1/0.01) = 100, level 3 halved an ODD shift of 25 and
    grouped voxel pairs {2m-1, 2m} instead of ME's {2m, 2m+1}, silently
    changing the coarse-level topology vs the reference
    (caught by tests/test_minkloc_ref_parity.py)."""
    import math

    half = -(-math.ceil(extent / step) // align) * align
    dims = (2 * half + 1,) * 3
    i = jnp.floor(points / step).astype(jnp.int32) + half
    valid = jnp.all((i >= 0) & (i < jnp.asarray(dims, jnp.int32)), axis=-1)
    i = jnp.clip(i, 0, jnp.asarray(dims, jnp.int32) - 1)
    return i, valid, dims


def quantize_polar(
    points: jax.Array,
    steps: Tuple[float, float, float],
    max_dist: float = 1.5,
    z_extent: float = 1.0,
) -> Tuple[jax.Array, jax.Array, Dims]:
    """PolarQuantizer (quantization.py:14-37): theta in degrees [0,360],
    ring distance, z — each floored at its own step.

    The z shift is rounded up to a multiple of 16 for ME floor-halving
    alignment like :func:`quantize_cartesian` (theta/ring floor from 0
    and are naturally aligned)."""
    import math

    theta = 180.0 + jnp.arctan2(points[..., 1], points[..., 0]) * (180.0 / jnp.pi)
    dist = jnp.sqrt(points[..., 0] ** 2 + points[..., 1] ** 2)
    z = points[..., 2]
    zoff = -(-math.ceil(z_extent / steps[2]) // 16) * 16
    dims = (
        int(360.0 // steps[0]) + 1,
        math.ceil(max_dist / steps[1]) + 1,
        2 * zoff + 1,
    )
    ti = jnp.floor(theta / steps[0]).astype(jnp.int32)
    ri = jnp.floor(dist / steps[1]).astype(jnp.int32)
    zi = jnp.floor(z / steps[2]).astype(jnp.int32) + zoff
    coords = jnp.stack([ti, ri, zi], axis=-1)
    dims_a = jnp.asarray(dims, jnp.int32)
    valid = jnp.all((coords >= 0) & (coords < dims_a), axis=-1)
    coords = jnp.clip(coords, 0, dims_a - 1)
    return coords, valid, dims


# ------------------------------------------------------------ pyramid
class Routes(NamedTuple):
    """Resolved kernel map consumed by :class:`SparseConv` — the
    feature-independent half of the convolution, computed once per map
    by :func:`routes_from_zmap` and shared by every conv on that map.

    src: (B, V, Kxy*L) int32 — per-tap input row (o-major, z-minor,
      dense ``kernel.reshape(k^3, ...)`` order); sentinel ``V`` when the
      neighbour is absent. Drives the im2col formulation directly and
      the conv0 mask fast path (validity = ``src != V``).
    anchor: (B, V, Kxy) int32 — insertion rank of each xy-column centre
      clipped to [0, V-1]; the zrun formulation gathers the k-row window
      at the anchor and re-derives tap routing from
      ``src == anchor + (r - h0)`` (pure int compares).
    """

    src: jax.Array
    anchor: jax.Array


class Pyramid(NamedTuple):
    """All coordinate maps + routed kernel maps for one forward (pure
    ints — built once per input, shared by every conv at a level).
    ``*_routes`` are :func:`routes_from_zmap` outputs.

    ``overflow`` is the max number of voxels dropped at any level by a
    static ``level_capacity`` smaller than the true occupancy (0 when
    uncompacted or when every capacity held) — see
    :func:`build_pyramid`."""

    tables: Tuple[VoxelTable, ...]              # level 0..num_levels
    dims: Tuple[Dims, ...]
    conv0_routes: "Routes"                      # level 0, k=conv0
    block_routes: Tuple["Routes", ...]          # level 1.., k=3
    down_routes: Tuple["Routes", ...]           # into level 1..
    up_nbr: Tuple[Tuple[jax.Array, jax.Array], ...]      # top-down steps
    overflow: jax.Array                         # () int32


def _compact_table(
    table: VoxelTable, capacity: Optional[int]
) -> Tuple[VoxelTable, jax.Array]:
    """Slice a sorted SENTINEL-padded table to a static per-level
    capacity (VERDICT r4 next #2: stride-2 levels merge voxels, but
    every level paid full-capacity route resolves / window gathers /
    select fusions / conv matmuls — on LiDAR-like surface clouds levels
    1-4 sit at 0.82/0.53/0.23/0.055 of N=4096, _probe_occupancy.py).

    Sorted keys put padding at the back, so compaction is a prefix
    slice; on overflow the HIGHEST keys drop (deterministic), their
    queries stop resolving (zero conv contribution) and their children
    lose the tconv path (guard in :func:`upsample_from_ranks`).
    Returns ``(table, excess)`` with ``excess`` = () int32 max dropped
    count over the batch (0 when capacity holds)."""
    v = table.keys.shape[1]
    if capacity is None or capacity >= v:
        return table, jnp.zeros((), jnp.int32)
    n = jnp.sum(table.mask, axis=1).astype(jnp.int32)
    excess = jnp.maximum(jnp.max(n) - capacity, 0)
    return (
        VoxelTable(keys=table.keys[:, :capacity], mask=table.mask[:, :capacity]),
        excess,
    )


def build_pyramid(
    coords: jax.Array,
    valid: jax.Array,
    dims: Dims,
    num_levels: int,
    num_top_down: int,
    conv0_kernel_size: int,
    level_capacity: Optional[Sequence[int]] = None,
) -> Pyramid:
    n_cells = dims[0] * dims[1] * dims[2]
    if n_cells >= _RANK_CLAMP:
        raise ValueError(
            f"grid {dims} has {n_cells} cells >= 2^29: voxel keys would "
            "overflow the packed int32 rank-merge sort keys (the "
            "reference 0.01 step = 201 cells/dim = 8.1M fits with room "
            "to spare); use a coarser quantization step or extend the "
            "key encoding to int64"
        )
    if level_capacity is not None and len(level_capacity) != num_levels + 1:
        raise ValueError(
            f"level_capacity needs {num_levels + 1} entries (level 0.."
            f"{num_levels}), got {len(level_capacity)}"
        )
    cap = lambda i: None if level_capacity is None else int(level_capacity[i])
    t0, overflow = _compact_table(build_table(coords, valid, dims), cap(0))
    tables: List[VoxelTable] = [t0]
    all_dims: List[Dims] = [dims]
    parent_ranks: List[jax.Array] = []
    down_routes: List[Routes] = []
    for li in range(num_levels):
        coarse, cdims, prank = downsample_with_ranks(tables[-1], all_dims[-1])
        coarse, excess = _compact_table(coarse, cap(li + 1))
        overflow = jnp.maximum(overflow, excess)
        parent_ranks.append(prank)
        # Down routes go through the rank-lookup z-run path, NOT
        # :func:`down_routes_from_ranks`: the scatter there materialises
        # ``src`` as a (B, Vc, 4, 2) buffer whose per-(o, z) minor-dim
        # slices in the conv compile to serialised kLoop fusions on TPU
        # (~32 ms EACH at the reference config — the round-4 composed-
        # forward trace; four of them cost more than the entire FPN).
        # The z-run resolve stays elementwise-fusable into its consumer,
        # and the extra (V + 4V)-query merge is ~1 ms/level.
        down_routes.append(
            routes_from_zmap(
                tables[-1].keys,
                zrun_down_map(coarse, cdims, tables[-1], all_dims[-1]),
                0,
            )
        )
        tables.append(coarse)
        all_dims.append(cdims)
    # Stride-1 conv anchors: symmetric-pair rank merges (the centre
    # column's rank is the slot index itself) — the down/up maps above
    # need no lookups at all (round 4; was one merged rank sort per
    # table at 131072-pad bitonic width for level 0, 40% of the sparse
    # forward).
    conv0_routes = None
    block_routes: List[Routes] = []
    for i in range(num_levels + 1):
        t, d = tables[i], all_dims[i]
        b, v = t.keys.shape
        k = conv0_kernel_size if i == 0 else 3
        h0 = (k - 1) // 2
        qc, z_ok = _zrun_conv_queries(t, d, k)
        offs = _xy_offsets(k)
        center = (k * k) // 2
        cpos = (offs[center + 1 :, 0] * d[1] + offs[center + 1 :, 1]) * d[2]
        fwd, rev = lookup_rank_pairs(t.keys, cpos)
        iota = jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (b, v))
        cols = []
        for o in range(k * k):
            if o < center:
                cols.append(rev[:, k * k - 2 - o - center])
            elif o == center:
                cols.append(iota)
            else:
                cols.append(fwd[:, o - center - 1])
        anchor = jnp.clip(jnp.stack(cols, axis=-1), 0, v - 1)
        routes = routes_from_zmap(
            t.keys, ZRunMap(anchor=anchor, qc=qc, z_ok=z_ok), h0,
            identity_col=center,
        )
        if i == 0:
            conv0_routes = routes
        else:
            block_routes.append(routes)
    up_nbr = []
    for s in range(num_top_down):
        lvl = num_levels - 1 - s                 # fine level of this step
        up_nbr.append(
            upsample_from_ranks(
                parent_ranks[lvl], tables[lvl], all_dims[lvl],
                tables[lvl + 1].keys.shape[1],
            )
        )
    return Pyramid(
        tables=tuple(tables),
        dims=tuple(all_dims),
        conv0_routes=conv0_routes,
        block_routes=tuple(block_routes),
        down_routes=tuple(down_routes),
        up_nbr=tuple(up_nbr),
        overflow=overflow,
    )


# ---------------------------------------------------------- conv core
def routes_from_zmap(
    keys: jax.Array,
    zmap: ZRunMap,
    h0: int,
    identity_col: Optional[int] = None,
) -> "Routes":
    """Resolve a :class:`ZRunMap` into a :class:`Routes` table.

    ``src (B, V, Kxy*L) int32``: for output site ``v`` and kernel
    tap ``(o, z)`` (o-major, z-minor — dense ``kernel.reshape(k^3, ...)``
    order), the input-table row holding that neighbour, or sentinel ``V``
    (one past the last row — callers gather from a feats table padded
    with one zero row) when the neighbour is absent.

    This is the feature-INDEPENDENT half of the convolution, computed
    once per kernel map and shared by every conv on that map: the
    (z-tap, window-row) matching is near-diagonal — the key ``qc + dz``
    sits at table position ``rank(qc) + s`` where ``s`` counts present
    keys between ``qc`` and ``qc + dz``, so ``s in [dz, -1]`` for dz<0,
    ``{0}`` for dz=0, ``[0, dz]`` for dz>0.  The window anchor is
    ``clip(rank, 0, V-1)``; the clip shifts positions by ``delta in
    {0, 1}``, and ``delta = 1`` implies ``qc`` itself is absent, which
    kills the dz=0 / dz>0 extremes.  Net: tap z (dz = z - h0) can only
    sit at window rows ``[min(h0, h0+dz), max(h0, h0+dz)]`` — 5 of 9
    (z, r) pairs for k=3, 11 of 25 for k=5, 3 of 4 for the stride-2 map
    (tests/test_minkloc_sparse.py covers the full-capacity anchor-clip
    edge against the conv_neighbor_table oracle).  Sorted-unique table
    keys mean at most one window row matches, so the per-pair
    ``where``-overwrites commute.

    Routing compares stay entirely in int32 — no keys ride through
    float tensors (the round-3 denormal-flush hazard documented in
    CLAUDE.md does not apply here). Expected keys are formed in-register
    as ``qc + dz`` under the ``z_ok`` mask (see :class:`ZRunMap`) —
    never materialized as a (B, V, Kxy, L) tensor.

    Gather economics (round-3 device traces): XLA row gathers pay a
    ~5 ns/row floor regardless of width, so the resolve does ONE wide
    gather of (B, V*Kxy) L-int window rows from a shift-built key-window
    table — per-(z, r)-pair narrow ``take_along_axis`` probes cost
    Kxy*L single-int rows apiece and ran ~350 ms/forward at the
    reference B=32 config (166 ms for the k=5 conv0 map alone).
    """
    b, v = keys.shape
    kxy, l = zmap.qc.shape[-1], zmap.z_ok.shape[-1]
    # output sites come from the map (a capacity-compacted coarse level
    # makes the down map rectangular: Vout < V); the sentinel stays the
    # INPUT table width v
    vout = zmap.qc.shape[1]
    # window-key table: kwin[b, s, r] = keys[b, s + r - h0] (contiguous
    # shifts, no gather); rows shifted past the table edge carry -1,
    # which never equals a present expected key (>= 0) nor a SENTINEL+dz
    # wraparound — so out-of-range window positions can never match
    cols = []
    for r in range(l):
        d = r - h0
        if d < 0:
            sh = jnp.concatenate(
                [jnp.full((b, -d), -1, jnp.int32), keys[:, :d]], axis=1
            )
        elif d > 0:
            sh = jnp.concatenate(
                [keys[:, d:], jnp.full((b, d), -1, jnp.int32)], axis=1
            )
        else:
            sh = keys
        cols.append(sh)
    kwin = jnp.stack(cols, axis=-1)                           # (B, V, L)
    if identity_col is None:
        g = gather(kwin, zmap.anchor.reshape(b, vout * kxy)).reshape(
            b, vout, kxy, l
        )
    else:
        # Stride-1 maps: the centre xy column's anchor is the row index
        # itself (build_pyramid stacks ``iota`` there, and the clip is
        # the identity on it), so its window gather returns ``kwin``
        # verbatim — splice it in and gather only the other Kxy-1
        # columns. Exact by construction; saves 1/Kxy of the resolve's
        # gather rows (the same identity-skip the conv applies to its
        # feature windows).
        others = [o for o in range(kxy) if o != identity_col]
        g_o = gather(
            kwin, zmap.anchor[..., others].reshape(b, vout * (kxy - 1))
        ).reshape(b, vout, kxy - 1, l)
        g = jnp.concatenate(
            [
                g_o[:, :, :identity_col],
                kwin[:, :, None, :],
                g_o[:, :, identity_col:],
            ],
            axis=2,
        )
    # column validity: SENTINEL + dz wraps out of the key range for
    # dz != 0, but dz == 0 leaves e == SENTINEL, which EQUALS the
    # SENTINEL-padded window keys whenever the anchor lands in the
    # table's padding tail — routing a phantom (zero-feature, but
    # counted by conv0's src != V mask fast path) slot. Round 4: mask
    # the compare explicitly; src now matches conv_neighbor_table
    # exactly on every column, in-bounds or not.
    colv = zmap.qc != SENTINEL                                # (B, V, Kxy)
    zcols = []
    for z in range(l):
        dz = z - h0
        e = zmap.qc + dz                                      # (B, V, Kxy)
        zok = zmap.z_ok[..., z][..., None] & colv             # (B, V, Kxy)
        sz = jnp.full((b, vout, kxy), v, jnp.int32)
        for rp in range(min(h0, h0 + dz), max(h0, h0 + dz) + 1):
            sz = jnp.where(
                (g[..., rp] == e) & zok, zmap.anchor + (rp - h0), sz
            )
        zcols.append(sz)
    src = jnp.stack(zcols, axis=-1).reshape(b, vout, kxy * l)
    return Routes(src=src, anchor=zmap.anchor)


def _shift_ext(feats: jax.Array, l: int, h0: int) -> jax.Array:
    """Shift-extended feature table: slot ``s`` of the result holds
    ``[feats[s - h0] | ... | feats[s + l - 1 - h0]]`` — built from
    contiguous shifts (sequential copies, no gather), so ONE row gather
    at a window anchor retrieves a whole z-run window. Rows shifted
    past the table edge are zero (absent neighbours contribute 0)."""
    b, v, c = feats.shape
    cols = []
    for r in range(l):
        d = r - h0
        if d < 0:
            sh = jnp.concatenate(
                [jnp.zeros((b, -d, c), feats.dtype), feats[:, :d]], axis=1
            )
        elif d > 0:
            sh = jnp.concatenate(
                [feats[:, d:], jnp.zeros((b, d, c), feats.dtype)], axis=1
            )
        else:
            sh = feats
        cols.append(sh)
    return jnp.concatenate(cols, axis=-1)                     # (B, V, L*C)


def _conv_formulation() -> str:
    """Which k>1 formulation :class:`SparseConv` uses (overridable via
    ``PCR_SPARSE_CONV`` for on-chip A/B measurement):

    - ``zrun``: one WIDE row-gather per xy kernel column (window of all
      k z-taps from the shift-extended table) + int-compare routing
      masks + one ``(k*Cin) -> Cout`` matmul per column. V*Kxy gathered
      rows per conv.
    - ``im2col``: one flat NARROW row-gather over all K = k^3 taps +
      one ``(K*Cin) -> Cout`` matmul. V*Kxy*L gathered rows per conv —
      k-fold more rows at the same bytes, and XLA row gathers pay a
      per-row floor (profiles/README.md), so zrun is the default.
    """
    import os

    return os.environ.get("PCR_SPARSE_CONV", "zrun")


class SparseConv(nn.Module):
    """Gather convolution over a voxel table with precomputed routing.

    Parameter ``kernel`` has the dense ``(k, k, k, Cin, Cout)`` shape and
    init (lecun_normal over fan_in = k^3*Cin, like ``nn.Conv``) so dense
    and sparse branches are parameter-compatible.

    For k > 1 the call takes a :class:`Routes` table from
    :func:`routes_from_zmap` (a bare ``src`` array is accepted for
    oracle tests and forces the im2col formulation). All key matching
    happened at route-build time; see :func:`_conv_formulation` for the
    two gather layouts. ``stride`` is carried for parameter bookkeeping
    only; the routing difference lives in the map (children at
    ``+{0..k-1}`` instead of ``±h``).
    """

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(
        self,
        feats,
        routes: Optional[jax.Array] = None,
        *,
        feats_are_mask: bool = False,
    ):
        cin = feats.shape[-1]
        k = self.kernel
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k,) * 3 + (cin, self.features),
        )
        anchor = None
        src = routes
        if isinstance(routes, Routes):
            src, anchor = routes.src, routes.anchor
        if feats_are_mask and k > 1:
            # conv0 fast path: the input feature of every stored voxel is
            # exactly 1.0 (the occupancy mask), so the gathered tap value
            # equals tap validity — the whole im2col collapses to a
            # (K,) -> Cout matmul on `src != V` with NO feature gather.
            # At the reference config this removes the largest gather in
            # the forward (B*V*125 rows for the k=5 conv0).
            assert cin == 1, "mask fast path requires cin == 1"
            valid = (src != feats.shape[1]).astype(jnp.float32)
            return jnp.einsum(
                "bvk,kd->bvd",
                valid,
                kernel.reshape(src.shape[-1], self.features),
                preferred_element_type=jnp.float32,
            ).astype(feats.dtype)
        if k == 1:
            # 1x1: the "offset" is the site itself, and invalid slots
            # already hold zero features — plain masked matmul
            return jnp.einsum(
                "bvc,cd->bvd",
                feats,
                kernel.reshape(cin, self.features).astype(feats.dtype),
                preferred_element_type=jnp.float32,
            ).astype(feats.dtype)
        if anchor is not None and _conv_formulation() == "zrun":
            return self._zrun(feats, src, anchor, kernel)
        return self._im2col(feats, src, kernel)

    def _zrun(self, feats, src, anchor, kernel):
        """One wide gather per xy column; tap routing re-derived from
        ``src == anchor + (r - h0)`` (see :func:`routes_from_zmap`: tap z
        can only sit at window rows ``[min(h0, h0+dz), max(h0, h0+dz)]``,
        so 5 of 9 (z, r) compares suffice for k=3). A spurious edge
        match at ``anchor + (r - h0) == V`` routes a zero-padded window
        row — contribution 0, same as the sentinel (covered by the
        full-capacity anchor-clip test)."""
        b, v, cin = feats.shape
        kxy = anchor.shape[-1]
        l = src.shape[-1] // kxy
        # output sites come from the map, not the input table: a
        # capacity-compacted coarse level makes Vout < Vin on the
        # stride-2 down convs
        vout = src.shape[1]
        h0 = 0 if self.stride == 2 else (self.kernel - 1) // 2
        # compute at the feature dtype (bf16 under COMPUTE_DTYPE; no-op
        # at f32) with f32 MXU accumulation via preferred_element_type
        w = kernel.reshape(kxy, l * cin, self.features).astype(feats.dtype)
        ext = _shift_ext(feats, l, h0)
        src3 = src.reshape(b, vout, kxy, l)
        # PCR_SPARSE_CONV_GATHER=raw bypasses ops.grouping.gather's
        # anti-cliff batch chunking (built for the B=100 eval gathers;
        # at cin>=128 the (B, V, L*C) ext table crosses its size
        # threshold and fragments the conv graph) — on-chip A/B knob.
        import os as _os

        if _os.environ.get("PCR_SPARSE_CONV_GATHER") == "raw":
            from ..ops.grouping import _gather_flat as _g
        else:
            _g = gather
        # NOTE: anchors are NOT monotone per offset — invalid edge
        # columns carry rank(SENTINEL) = V-1 spikes mid-sequence — so
        # gather's sorted_indices promise must stay off here.
        out = None
        for o in range(kxy):
            if self.stride == 1 and o == kxy // 2:
                # centre column: its queries are the table keys
                # themselves, so the anchor is the row index — the
                # gather is the identity. Skipping it drops 1/Kxy of
                # the conv's gather traffic (the dominant HBM consumer)
                # exactly: on invalid slots the routed window rows
                # differ from the clipped-rank oracle's only where both
                # are zero-padded (src == V can only match at the
                # anchor+1 edge, which reads the zero row either way).
                g = ext
                anc = jax.lax.broadcasted_iota(jnp.int32, (b, vout), 1)
            else:
                g = _g(ext, anchor[..., o])                   # (B, V, L*C)
                anc = anchor[..., o]
            sels = []
            for z in range(l):
                dz = z - h0
                sel = None
                for r in range(min(h0, h0 + dz), max(h0, h0 + dz) + 1):
                    m = (src3[..., o, z] == anc + (r - h0))
                    t = g[..., r * cin : (r + 1) * cin] * m[..., None].astype(
                        feats.dtype
                    )
                    sel = t if sel is None else sel + t
                sels.append(sel)
            if _os.environ.get("PCR_SPARSE_CONV") == "zrun_split":
                # A/B formulation: per-z dots (the same FLOPs) instead
                # of one (L*C)-wide dot — the hypothesis was that the
                # sels CONCATENATE blocks operand fusion. MEASURED
                # NEGATIVE (round 4, v5e): 103.7 desc/s vs 158.6 for
                # the wide dot (-35%: three dot outputs accumulate
                # through HBM), and NOT bit-exact on-chip (2.3e-9 —
                # (d0+d1)+d2 groups f32 differently than one L*C
                # contraction on the MXU, though XLA-CPU groups them
                # identically). Kept as a measured A/B knob only.
                wz = kernel.reshape(kxy, l, cin, self.features)
                term = None
                for z in range(l):
                    tz = jnp.einsum(
                        "bvc,cd->bvd",
                        sels[z],
                        wz[o, z].astype(feats.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    term = tz if term is None else term + tz
            else:
                term = jnp.einsum(
                    "bvc,cd->bvd",
                    jnp.concatenate(sels, axis=-1),
                    w[o],
                    preferred_element_type=jnp.float32,
                )
            out = term if out is None else out + term
        return out.astype(feats.dtype)

    def _im2col(self, feats, src, kernel):
        """One flat row-gather over all K taps (absent neighbours hit an
        appended zero row) + one ``(K*Cin) -> Cout`` MXU matmul."""
        b, _, cin = feats.shape
        v, kk = src.shape[1], src.shape[-1]      # output sites, taps
        w = kernel.reshape(kk * cin, self.features).astype(feats.dtype)
        fp = jnp.concatenate(
            [feats, jnp.zeros((b, 1, cin), feats.dtype)], axis=1
        )
        # bound the transient im2col block (B, V, K*Cin) to ~512 MB by
        # slicing output sites; each chunk is gather -> matmul
        vc = max(1, min(v, (512 * 1024 * 1024) // max(1, b * kk * cin * 4)))
        outs = []
        for s in range(0, v, vc):
            n = min(vc, v - s)
            g = gather(fp, src[:, s : s + n].reshape(b, n * kk))
            outs.append(
                jnp.einsum(
                    "bvc,cd->bvd",
                    g.reshape(b, n, kk * cin),
                    w,
                    preferred_element_type=jnp.float32,
                )
            )
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        return out.astype(feats.dtype)


class _SparseConvBN(nn.Module):
    """Bias-free conv + masked BN on the output coordinate map —
    parameter tree mirrors the dense ``_Conv3dBN`` (conv/bn)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(
        self, feats, src, out_mask, *, train: bool = False,
        feats_are_mask: bool = False,
    ):
        x = SparseConv(self.features, self.kernel, self.stride, name="conv")(
            feats, src, feats_are_mask=feats_are_mask
        )
        return MaskedBatchNorm(name="bn")(
            x, out_mask, use_running_average=not train
        )


class SparseBasicBlock(nn.Module):
    """Residual block on a table (BasicBlock/ECABasicBlock,
    eca_block.py:38-72); names mirror ``BasicBlock3d``."""

    planes: int
    use_eca: bool = False

    @nn.compact
    def __call__(self, x, src, mask, *, train: bool = False):
        residual = x
        out = _SparseConvBN(self.planes, name="conv1")(x, src, mask, train=train)
        out = nn.relu(out)
        out = _SparseConvBN(self.planes, name="conv2")(out, src, mask, train=train)
        if self.use_eca:
            out = ECALayer(self.planes, name="eca")(out, mask)
        if residual.shape[-1] != self.planes:
            residual = _SparseConvBN(self.planes, kernel=1, name="downsample")(
                x, None, mask, train=train
            )
        return nn.relu(out + residual)


class SparseBottleneck(nn.Module):
    planes: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x, src, mask, *, train: bool = False):
        residual = x
        out = nn.relu(
            _SparseConvBN(self.planes, kernel=1, name="conv1")(
                x, None, mask, train=train
            )
        )
        out = nn.relu(
            _SparseConvBN(self.planes, name="conv2")(out, src, mask, train=train)
        )
        out = _SparseConvBN(self.planes * self.expansion, kernel=1, name="conv3")(
            out, None, mask, train=train
        )
        if residual.shape[-1] != self.planes * self.expansion:
            residual = _SparseConvBN(
                self.planes * self.expansion, kernel=1, name="downsample"
            )(x, None, mask, train=train)
        return nn.relu(out + residual)


# ---------------------------------------------------------------- FPN
class SparseVoxelFPN(nn.Module):
    """MinkFPN (minkfpn.py:9-93) over voxel tables — module names and
    parameter shapes identical to the dense :class:`DenseVoxelFPN`."""

    out_channels: int
    planes: Sequence[int] = (32, 64, 64)
    layers: Sequence[int] = (1, 1, 1)
    num_top_down: int = 1
    conv0_kernel_size: int = 5
    block: str = "ECABasicBlock"
    # Mixed-precision compute dtype: the residual trunk (gather convs —
    # the HBM movers) runs at this dtype with f32 params, f32 MXU
    # accumulation and f32 BN statistics; routing stays int32. None = f32.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feats, pyramid: Pyramid, *, train: bool = False):
        use_eca = self.block == "ECABasicBlock"
        bottleneck = self.block == "Bottleneck"
        num_bottom_up = len(self.layers)
        masks = [t.mask for t in pyramid.tables]

        # feats=None -> occupancy-indicator input (the reference feeds
        # MinkFPN all-ones features at stored coords); conv0 then takes
        # the gather-free mask fast path in SparseConv
        feats_are_mask = feats is None
        if feats_are_mask:
            feats = masks[0][..., None].astype(jnp.float32)
        x = _SparseConvBN(
            self.planes[0], kernel=self.conv0_kernel_size, name="conv0"
        )(
            feats, pyramid.conv0_routes, masks[0], train=train,
            feats_are_mask=feats_are_mask,
        )
        x = nn.relu(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feature_maps = []
        if self.num_top_down == num_bottom_up:
            feature_maps.append(x)

        for ndx, (plane, n_layers) in enumerate(zip(self.planes, self.layers)):
            x = nn.relu(
                _SparseConvBN(x.shape[-1], kernel=2, stride=2, name=f"down{ndx}")(
                    x, pyramid.down_routes[ndx], masks[ndx + 1], train=train
                )
            )
            for li in range(n_layers):
                if bottleneck:
                    x = SparseBottleneck(plane, name=f"block{ndx}_{li}")(
                        x, pyramid.block_routes[ndx], masks[ndx + 1], train=train
                    )
                else:
                    x = SparseBasicBlock(
                        plane, use_eca=use_eca, name=f"block{ndx}_{li}"
                    )(x, pyramid.block_routes[ndx], masks[ndx + 1], train=train)
            if num_bottom_up - 1 - self.num_top_down <= ndx < num_bottom_up - 1:
                feature_maps.append(x)

        level = num_bottom_up
        m = lambda lvl: masks[lvl][..., None].astype(x.dtype)
        x = SparseConv(self.out_channels, kernel=1, name="lateral0")(x) * m(level)
        for ndx in range(self.num_top_down):
            level -= 1
            u_idx, u_valid = pyramid.up_nbr[ndx]
            x = SparseTConv(self.out_channels, name=f"tconv{ndx}")(
                x, u_idx, u_valid
            ) * m(level)
            lateral = SparseConv(
                self.out_channels, kernel=1, name=f"lateral{ndx + 1}"
            )(feature_maps[-ndx - 1]) * m(level)
            x = x + lateral
        return x, masks[num_bottom_up - self.num_top_down]


class SparseTConv(nn.Module):
    """Transposed conv (k=2, s=2) onto the bottom-up fine map: the
    ``up_nbr`` table carries exactly one valid (parent, flipped-q) slot
    per fine site. Kernel shape matches dense ``nn.ConvTranspose``."""

    features: int

    @nn.compact
    def __call__(self, coarse_feats, up_idx, up_valid):
        cin = coarse_feats.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, 2, cin, self.features)
        )
        w = kernel.reshape(8, cin, self.features).astype(coarse_feats.dtype)
        parent = gather(coarse_feats, up_idx[..., 0])          # (B, V, Cin)
        # ONE (Cin -> 8*Cout) matmul, then a masked slice-select: each
        # fine site has at most one valid kernel slot, so the old
        # 8x masked-operand einsums (8 accumulation passes over
        # (B, V, Cout) partials) collapse into one MXU call + a select.
        # Bit-exact: every output element is the same dot over Cin
        # (per-o weight columns are independent in the wide matmul).
        s = jnp.einsum(
            "bvc,ocd->bvod", parent, w, preferred_element_type=jnp.float32
        )
        out = jnp.sum(
            s * up_valid[..., None].astype(s.dtype), axis=2
        )
        return out.astype(coarse_feats.dtype)


# -------------------------------------------------------------- model
class MinkLocSparse(nn.Module):
    """``(B, N, 3) -> (B, output_dim)`` at the reference's exact
    quantization resolution (no grid cap)."""

    feature_size: int = 256
    output_dim: int = 256
    planes: Sequence[int] = (64, 128, 64, 32)
    layers: Sequence[int] = (1, 1, 1, 1)
    num_top_down: int = 2
    conv0_kernel_size: int = 5
    block: str = "ECABasicBlock"
    pooling: str = "GeM"
    coordinates: str = "cartesian"
    quantization_step: Any = 0.01
    extent: float = 1.0
    polar_max_dist: float = 1.5
    normalize_embeddings: bool = False
    # COMPUTE_DTYPE "bfloat16": bf16 trunk, f32 quantization/routing/
    # params/pooling, f32 descriptor out (see patch_aug_net.py).
    compute_dtype: Optional[Any] = None
    # Static per-level table capacities (len num_levels+1; None = full
    # capacity N at every level). Stride-2 levels merge voxels, so on
    # surface-like clouds the deeper tables sit far below N and every
    # route resolve / window gather / conv matmul pays for padding —
    # calibrate with measure_level_occupancy/suggest_level_capacities.
    # MinkowskiEngine anchor: minkfpn.py:9-93 only ever touches stored
    # sites. Overflowing a capacity drops the highest-key voxels
    # deterministically; pass return_diagnostics=True (or check the
    # suggested capacities offline) to detect it.
    level_capacity: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(
        self,
        points: jax.Array,
        *,
        train: bool = False,
        return_diagnostics: bool = False,
    ) -> jax.Array:
        if points.ndim == 4:
            points = points.squeeze(1)
        if self.coordinates == "cartesian":
            step = float(self.quantization_step)
            coords, valid, dims = quantize_cartesian(points, step, self.extent)
        else:
            steps = self.quantization_step
            if not isinstance(steps, (tuple, list)):
                steps = (steps,) * 3
            coords, valid, dims = quantize_polar(
                points, tuple(float(s) for s in steps),
                max_dist=self.polar_max_dist, z_extent=self.extent,
            )
        pyramid = build_pyramid(
            coords, valid, dims,
            num_levels=len(self.layers),
            num_top_down=self.num_top_down,
            conv0_kernel_size=self.conv0_kernel_size,
            level_capacity=self.level_capacity,
        )
        x, out_mask = SparseVoxelFPN(
            out_channels=self.feature_size,
            planes=self.planes,
            layers=self.layers,
            num_top_down=self.num_top_down,
            conv0_kernel_size=self.conv0_kernel_size,
            block=self.block,
            dtype=self.compute_dtype,
            name="backbone",
        )(None, pyramid, train=train)
        if self.compute_dtype is not None:
            # pooling (GeM powers) and the descriptor are f32
            x = x.astype(jnp.float32)
        out = MaskedPooling(
            self.pooling, self.feature_size, self.output_dim, name="pooling"
        )(x, out_mask, train=train)
        if self.normalize_embeddings:
            out = l2_normalize(out, axis=-1)
        if return_diagnostics:
            return out, {"capacity_overflow": pyramid.overflow}
        return out


def measure_level_occupancy(
    points,
    *,
    num_levels: int = 4,
    coordinates: str = "cartesian",
    quantization_step: Any = 0.01,
    extent: float = 1.0,
    polar_max_dist: float = 1.5,
):
    """Occupied-voxel counts per pyramid level for capacity calibration.

    Args:
      points: ``(B, N, 3)`` clouds (a representative sample of the
        dataset the model will serve).
    Returns: ``(B, num_levels + 1)`` int array of stored-voxel counts.
    """
    import functools

    import numpy as np

    def counts_fn(points):
        if coordinates == "cartesian":
            coords, valid, dims = quantize_cartesian(
                points, float(quantization_step), extent
            )
        else:
            steps = quantization_step
            if not isinstance(steps, (tuple, list)):
                steps = (steps,) * 3
            coords, valid, dims = quantize_polar(
                points, tuple(float(s) for s in steps),
                max_dist=polar_max_dist, z_extent=extent,
            )
        table = build_table(coords, valid, dims)
        counts = [jnp.sum(table.mask, axis=1)]
        d = dims
        for _ in range(num_levels):
            table, d = downsample_table(table, d)
            counts.append(jnp.sum(table.mask, axis=1))
        return jnp.stack(counts, axis=1)

    # jitted: eager sorts through the axon tunnel pay ~28 ms per op
    return np.asarray(jax.jit(counts_fn)(jnp.asarray(points)))


def suggest_level_capacities(
    counts, *, margin: float = 1.25, align: int = 256, full: Optional[int] = None
):
    """Turn measured occupancy (:func:`measure_level_occupancy`) into
    static per-level capacities: per-level max count x ``margin``,
    rounded up to ``align`` (sublane/lane-friendly sort and matmul
    widths), capped at ``full`` (the uncompacted capacity, = N)."""
    import math

    import numpy as np

    counts = np.asarray(counts)
    caps = []
    for lvl in range(counts.shape[1]):
        c = int(math.ceil(counts[:, lvl].max() * margin / align)) * align
        caps.append(min(c, full) if full is not None else c)
    return caps
