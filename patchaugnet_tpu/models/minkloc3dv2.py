"""MinkLoc3Dv2 — dense-voxel TPU re-architecture.

The reference builds MinkLoc3Dv2 on MinkowskiEngine sparse convolutions
(place_recognition/Minkloc3D_V2/models/minkloc.py:12-39, minkfpn.py:9-93)
which has no TPU analogue: sparse gather-scatter convs are hostile to
the MXU. The idiomatic TPU route (SURVEY.md §7.7) is a **dense voxel
grid**: quantize -> scatter occupancy into a fixed ``G^3`` grid ->
regular ``conv3d`` FPN (XLA tiles dense convs onto the MXU) -> masked
global pooling over occupied voxels. Numerical parity with sparse
convolution is not achievable; the target is metric parity under the
same config schema.

Preserved reference semantics:
  - FPN topology: conv0 (k=5) -> ``len(layers)`` stride-2 bottom-up
    levels with residual blocks -> ``num_top_down`` transposed-conv
    top-down steps with 1x1 lateral adds (minkfpn.py:66-93);
  - blocks: BasicBlock / Bottleneck / ECABasicBlock with the ECA
    channel-attention layer (layers/eca_block.py:12-72);
  - poolings: MAC / SPoC / GeM / netvlad(gc) (layers/pooling.py:11-85),
    here masked to occupied voxels (the sparse global poolings only see
    stored points);
  - quantizers: Cartesian + Polar (misc/quantization.py:14-50) mapped
    onto fixed dense grids;
  - config: the same INI schema via :mod:`minkloc_config`.

Sparse-equivalence (round 2): every conv output is zeroed outside the
level occupancy mask and BatchNorm statistics are computed over
occupied voxels only (:class:`MaskedBatchNorm`). With that invariant a
dense convolution computes EXACTLY what the Minkowski sparse
convolution computes at each stored site — empty neighbours contribute
zero to the sum, downsampled coordinate maps are the max-pooled masks,
and the global poolings see only stored sites — so the dense branch is
functionally the sparse network on a bounded grid, not an
approximation of it.

Dense-grid scope (round 3): this branch's resolution is bounded by
``max_grid_size`` (default 48/dim; effective step ``2*extent/G``). The
reference's native 0.01-step quantization is served by the DEFAULT
**sparse voxel-table** branch (:mod:`.minkloc_sparse` — gather
convolution over a fixed-capacity occupied-voxel table, no cap), which
shares this module's parameter tree bit-for-bit
(tests/test_minkloc_sparse.py). The dense branch remains as the
equivalence oracle and as an opt-in (``backend: dense``) for coarse
grids.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import NetVLADLoupe, l2_normalize
from ..nn.core import BN_EPS, BN_MOMENTUM


# ------------------------------------------------------------ voxelize
def cartesian_voxelize(
    points: jax.Array, grid_size: int, extent: float = 1.0
) -> Tuple[jax.Array, jax.Array]:
    """Scatter ``(B, N, 3)`` points in ``[-extent, extent]`` into a dense
    occupancy grid.

    Returns ``(grid (B, G, G, G, 1) occupancy, mask (B, G, G, G) bool)``.
    """
    b, n, _ = points.shape
    g = grid_size
    ijk = jnp.clip(
        jnp.floor((points + extent) / (2 * extent) * g).astype(jnp.int32), 0, g - 1
    )
    flat = (ijk[..., 0] * g + ijk[..., 1]) * g + ijk[..., 2]       # (B, N)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    occ = jnp.zeros((b, g * g * g), jnp.float32).at[batch_idx, flat].max(1.0)
    grid = occ.reshape(b, g, g, g, 1)
    return grid, occ.reshape(b, g, g, g) > 0


def polar_voxelize(
    points: jax.Array,
    grid_shape: Tuple[int, int, int],
    max_dist: float = 1.0,
    z_extent: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Polar quantization (theta, ring, z) onto a dense grid
    (misc/quantization.py:14-38 mapped to fixed bins)."""
    b, n, _ = points.shape
    gt, gr, gz = grid_shape
    theta = jnp.arctan2(points[..., 1], points[..., 0]) / (2 * jnp.pi) + 0.5
    dist = jnp.sqrt(points[..., 0] ** 2 + points[..., 1] ** 2) / max_dist
    z = (points[..., 2] + z_extent) / (2 * z_extent)
    ti = jnp.clip((theta * gt).astype(jnp.int32), 0, gt - 1)
    ri = jnp.clip((dist * gr).astype(jnp.int32), 0, gr - 1)
    zi = jnp.clip((z * gz).astype(jnp.int32), 0, gz - 1)
    flat = (ti * gr + ri) * gz + zi
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    occ = jnp.zeros((b, gt * gr * gz), jnp.float32).at[batch_idx, flat].max(1.0)
    grid = occ.reshape(b, gt, gr, gz, 1)
    return grid, occ.reshape(b, gt, gr, gz) > 0


# ------------------------------------------------------------- blocks
class MaskedBatchNorm(nn.Module):
    """BatchNorm whose statistics cover occupied voxels only — the
    Minkowski BN analogue (sparse tensors normalise over stored sites).
    Output is zeroed outside the mask to keep the sparse-equivalence
    invariant (a bias-shifted empty site would otherwise leak into the
    next convolution's sums).

    Rank-agnostic: ``x`` may be a dense grid ``(B, G, G, G, C)`` or a
    voxel table ``(B, V, C)`` (minkloc_sparse.py); statistics reduce
    over every axis but the channel axis, restricted to ``mask``."""

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x, mask, *, use_running_average: bool):
        c = x.shape[-1]
        red = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # statistics and the normalisation itself run in f32 even when
        # the feature path is bf16 (COMPUTE_DTYPE); output returns to
        # x.dtype so the bf16 chain is preserved. All casts are no-ops
        # on the default f32 path.
        xf = x.astype(jnp.float32)
        mf = mask[..., None].astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            cnt = jnp.maximum(jnp.sum(mf), 1.0)
            mean = jnp.sum(xf * mf, axis=red) / cnt
            var = jnp.sum((xf - mean) ** 2 * mf, axis=red) / cnt
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return (y * mf).astype(x.dtype)


class ECALayer(nn.Module):
    """Efficient channel attention (eca_block.py:12-35): global average
    over occupied voxels, 1-D conv across channels, sigmoid gate."""

    channels: int
    gamma: int = 2
    b: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        t = int(abs((math.log2(self.channels) + self.b) / self.gamma))
        k = t if t % 2 else t + 1
        red = tuple(range(1, x.ndim - 1))
        # channel means in f32 (bf16 sums over thousands of voxels lose
        # precision); the gate returns to x.dtype — no-ops under f32
        m = mask[..., None].astype(jnp.float32)
        y = jnp.sum(x.astype(jnp.float32) * m, axis=red) / jnp.maximum(
            jnp.sum(m, axis=red), 1.0
        )                                                       # (B, C)
        y = nn.Conv(1, (k,), padding="SAME", use_bias=False, name="conv")(
            y[..., None]
        )[..., 0]
        gate = jax.nn.sigmoid(y).astype(x.dtype)
        return x * gate.reshape(gate.shape[0], *([1] * (x.ndim - 2)), -1)


class _Conv3dBN(nn.Module):
    """Bias-free conv + masked BN; the output lives on ``out_mask``
    (for stride 2 that is the max-pooled input mask — exactly the
    Minkowski downsampled coordinate map)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, out_mask, *, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel,) * 3,
            strides=(self.stride,) * 3,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        return MaskedBatchNorm(name="bn")(
            x, out_mask, use_running_average=not train
        )


class BasicBlock3d(nn.Module):
    """Dense analogue of the Minkowski ResNet BasicBlock; ``use_eca``
    adds the ECA gate after norm2 (ECABasicBlock, eca_block.py:38-72)."""

    planes: int
    use_eca: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        residual = x
        out = _Conv3dBN(self.planes, dtype=self.dtype, name="conv1")(
            x, mask, train=train
        )
        out = nn.relu(out)
        out = _Conv3dBN(self.planes, dtype=self.dtype, name="conv2")(
            out, mask, train=train
        )
        if self.use_eca:
            out = ECALayer(self.planes, name="eca")(out, mask)
        if residual.shape[-1] != self.planes:
            residual = _Conv3dBN(
                self.planes, kernel=1, dtype=self.dtype, name="downsample"
            )(x, mask, train=train)
        return nn.relu(out + residual)


class Bottleneck3d(nn.Module):
    planes: int
    expansion: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        residual = x
        out = nn.relu(
            _Conv3dBN(self.planes, kernel=1, dtype=self.dtype, name="conv1")(
                x, mask, train=train
            )
        )
        out = nn.relu(
            _Conv3dBN(self.planes, dtype=self.dtype, name="conv2")(
                out, mask, train=train
            )
        )
        out = _Conv3dBN(
            self.planes * self.expansion, kernel=1, dtype=self.dtype,
            name="conv3",
        )(out, mask, train=train)
        if residual.shape[-1] != self.planes * self.expansion:
            residual = _Conv3dBN(
                self.planes * self.expansion, kernel=1, dtype=self.dtype,
                name="downsample",
            )(x, mask, train=train)
        return nn.relu(out + residual)


# ---------------------------------------------------------------- FPN
class DenseVoxelFPN(nn.Module):
    """Dense conv3d FPN with MinkFPN's exact topology (minkfpn.py:9-93)."""

    out_channels: int
    planes: Sequence[int] = (32, 64, 64)
    layers: Sequence[int] = (1, 1, 1)
    num_top_down: int = 1
    conv0_kernel_size: int = 5
    block: str = "ECABasicBlock"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, grid, mask, *, train: bool = False):
        use_eca = self.block == "ECABasicBlock"
        bottleneck = self.block == "Bottleneck"
        num_bottom_up = len(self.layers)
        masks = [mask]
        for _ in range(num_bottom_up):
            m = masks[-1]
            masks.append(
                nn.max_pool(
                    m[..., None].astype(jnp.float32), (2, 2, 2), (2, 2, 2)
                )[..., 0]
                > 0
            )

        x = _Conv3dBN(
            self.planes[0], kernel=self.conv0_kernel_size, dtype=self.dtype,
            name="conv0",
        )(grid, masks[0], train=train)
        x = nn.relu(x)
        feature_maps = []
        fm_masks = []
        if self.num_top_down == num_bottom_up:
            feature_maps.append(x)
            fm_masks.append(masks[0])

        for ndx, (plane, n_layers) in enumerate(zip(self.planes, self.layers)):
            # stride-2 downsample keeps current channel count, then blocks
            # change it (minkfpn.py:44-47, 75-82)
            x = nn.relu(
                _Conv3dBN(
                    x.shape[-1], kernel=2, stride=2, dtype=self.dtype,
                    name=f"down{ndx}",
                )(x, masks[ndx + 1], train=train)
            )
            for li in range(n_layers):
                if bottleneck:
                    x = Bottleneck3d(
                        plane, dtype=self.dtype, name=f"block{ndx}_{li}"
                    )(x, masks[ndx + 1], train=train)
                else:
                    x = BasicBlock3d(
                        plane, use_eca=use_eca, dtype=self.dtype,
                        name=f"block{ndx}_{li}",
                    )(x, masks[ndx + 1], train=train)
            if num_bottom_up - 1 - self.num_top_down <= ndx < num_bottom_up - 1:
                feature_maps.append(x)
                fm_masks.append(masks[ndx + 1])

        level = num_bottom_up                  # mask level x currently sits at
        m = lambda lvl: masks[lvl][..., None].astype(x.dtype)
        # bias-free like MinkowskiConvolution (minkfpn.py:49-62 uses the
        # ME default bias=False throughout)
        x = nn.Conv(
            self.out_channels, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="lateral0",
        )(x) * m(level)
        for ndx in range(self.num_top_down):
            level -= 1
            # generative upsample, then keep only the fine-level stored
            # sites (the lateral's coordinate map) before the sparse add
            x = nn.ConvTranspose(
                self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                use_bias=False, dtype=self.dtype, name=f"tconv{ndx}"
            )(x) * m(level)
            lateral = nn.Conv(
                self.out_channels, (1, 1, 1), use_bias=False,
                dtype=self.dtype, name=f"lateral{ndx + 1}"
            )(feature_maps[-ndx - 1]) * m(level)
            x = x + lateral
        out_mask = masks[num_bottom_up - self.num_top_down]
        return x, out_mask


# ------------------------------------------------------------ pooling
class MaskedPooling(nn.Module):
    """MAC / SPoC / GeM / netvlad over occupied voxels
    (layers/pooling.py:11-85; sparse global poolings see only stored
    points — the mask reproduces that)."""

    pool_method: str
    in_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        b = x.shape[0]
        feats = x.reshape(b, -1, x.shape[-1])               # (B, V, C)
        m = mask.reshape(b, -1, 1).astype(x.dtype)
        count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        if self.pool_method == "MAC":
            neg = jnp.where(m > 0, feats, -jnp.inf)
            out = jnp.max(neg, axis=1)
            return jnp.where(jnp.isfinite(out), out, 0.0)
        if self.pool_method == "SPoC":
            return jnp.sum(feats * m, axis=1) / count
        if self.pool_method == "GeM":
            p = self.param("p", nn.initializers.constant(3.0), (1,))
            eps = 1e-6
            clamped = jnp.maximum(feats, eps) ** p
            pooled = jnp.sum(clamped * m, axis=1) / count
            return pooled ** (1.0 / p)
        if self.pool_method in ("netvlad", "netvladgc"):
            # zero-padded rows, like the reference pad_sequence
            # (pooling.py:73-79)
            return NetVLADLoupe(
                feature_size=self.in_dim,
                max_samples=feats.shape[1],
                cluster_size=64,
                output_dim=self.output_dim,
                gating=self.pool_method == "netvladgc",
                name="net_vlad",
            )(feats * m, train=train)
        raise NotImplementedError(self.pool_method)


# -------------------------------------------------------------- model
class MinkLocDense(nn.Module):
    """``(B, N, 3) -> (B, output_dim)`` global descriptor."""

    feature_size: int = 256
    output_dim: int = 256
    planes: Sequence[int] = (64, 128, 64, 32)
    layers: Sequence[int] = (1, 1, 1, 1)
    num_top_down: int = 2
    conv0_kernel_size: int = 5
    block: str = "ECABasicBlock"
    pooling: str = "GeM"
    coordinates: str = "cartesian"
    grid_size: int = 48
    polar_grid: Tuple[int, int, int] = (64, 32, 16)
    normalize_embeddings: bool = False
    # COMPUTE_DTYPE "bfloat16": bf16 conv/block trunk, f32 quantization
    # and masked-BN statistics, f32 pooling + descriptor — the same
    # mixed-precision contract as MinkLocSparse (minkloc_sparse.py).
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, points: jax.Array, *, train: bool = False) -> jax.Array:
        if points.ndim == 4:
            points = points.squeeze(1)
        factor = 2 ** len(self.layers)
        dims = (
            (self.grid_size,) * 3 if self.coordinates == "cartesian" else self.polar_grid
        )
        assert all(d % factor == 0 for d in dims), (
            f"grid dims {dims} must divide by 2^len(layers)={factor} for the FPN"
        )
        if self.coordinates == "cartesian":
            grid, mask = cartesian_voxelize(points, self.grid_size)
        else:
            grid, mask = polar_voxelize(points, self.polar_grid)
        feats, out_mask = DenseVoxelFPN(
            out_channels=self.feature_size,
            planes=self.planes,
            layers=self.layers,
            num_top_down=self.num_top_down,
            conv0_kernel_size=self.conv0_kernel_size,
            block=self.block,
            dtype=self.compute_dtype,
            name="backbone",
        )(grid, mask, train=train)
        if self.compute_dtype is not None:
            # pooling (GeM powers) and the descriptor stay f32
            feats = feats.astype(jnp.float32)
        pool_dim = (
            self.feature_size
            if self.pooling in ("MAC", "SPoC", "GeM")
            else self.feature_size
        )
        out = MaskedPooling(
            self.pooling, pool_dim, self.output_dim, name="pooling"
        )(feats, out_mask, train=train)
        if self.normalize_embeddings:
            out = l2_normalize(out, axis=-1)
        return out


def grid_size_for_step(
    quantization_step: float,
    num_levels: int,
    extent: float = 1.0,
    max_grid_size: int = 48,
) -> int:
    """Grid resolution implied by the reference quantization step
    (misc/quantization.py:40-50): ``ceil(2*extent/step)`` cells per dim,
    rounded up to a multiple of ``2^num_levels`` (FPN downsampling),
    capped at ``max_grid_size`` (dense-grid memory bound — at the cap
    the effective step is ``2*extent/max_grid_size``)."""
    factor = 2 ** num_levels
    g = math.ceil(2 * extent / quantization_step)
    g = ((g + factor - 1) // factor) * factor
    cap = (max_grid_size // factor) * factor
    if cap <= 0:
        raise ValueError(
            f"max_grid_size={max_grid_size} is smaller than the FPN "
            f"downsampling factor 2^{num_levels}={factor}: every level "
            "must keep at least one voxel — reduce the level count or "
            "raise the grid bound"
        )
    return min(g, cap)


def build_minkloc(param: Dict[str, Any]):
    """Build from a flat config dict (YAML keys or ModelParams fields).

    Backend selection: the default is the **sparse voxel-table** branch
    (:class:`~.minkloc_sparse.MinkLocSparse`), which runs at the exact
    configured ``quantization_step`` — including the reference's 0.01
    cartesian step — with no grid cap. The dense-grid branch is chosen
    when an explicit ``grid_size`` is given or ``backend: dense`` is set
    (its resolution is bounded by ``max_grid_size``; both branches share
    one parameter tree, tests/test_minkloc_sparse.py).
    """
    layers = tuple(param.get("layers", (1, 1, 1, 1)))
    backend = param.get("backend")
    grid_size = param.get("grid_size")
    if backend is None:
        backend = "dense" if grid_size is not None else "sparse"
    if backend == "sparse":
        from .minkloc_sparse import MinkLocSparse

        step = param.get("quantization_step", 0.01)
        if isinstance(step, (list, tuple)):
            step = tuple(float(s) for s in step)
        level_capacity = param.get("level_capacity")
        if level_capacity is not None:
            level_capacity = tuple(int(c) for c in level_capacity)
        return MinkLocSparse(
            level_capacity=level_capacity,
            feature_size=param.get("feature_size", 256),
            output_dim=param.get("output_dim", 256),
            planes=tuple(param.get("planes", (64, 128, 64, 32))),
            layers=layers,
            num_top_down=param.get("num_top_down", 2),
            conv0_kernel_size=param.get("conv0_kernel_size", 5),
            block=param.get("block", "ECABasicBlock"),
            pooling=param.get("pooling", "GeM"),
            coordinates=param.get("coordinates", "cartesian"),
            quantization_step=step,
            extent=param.get("extent", 1.0),
            polar_max_dist=param.get("polar_max_dist", 1.5),
            normalize_embeddings=param.get("normalize_embeddings", False),
            compute_dtype=param.get("COMPUTE_DTYPE", param.get("compute_dtype")),
        )
    if grid_size is None:
        grid_size = grid_size_for_step(
            param.get("quantization_step", 0.01),
            num_levels=len(layers),
            max_grid_size=param.get("max_grid_size", 48),
        )
    return MinkLocDense(
        feature_size=param.get("feature_size", 256),
        output_dim=param.get("output_dim", 256),
        planes=tuple(param.get("planes", (64, 128, 64, 32))),
        layers=layers,
        num_top_down=param.get("num_top_down", 2),
        conv0_kernel_size=param.get("conv0_kernel_size", 5),
        block=param.get("block", "ECABasicBlock"),
        pooling=param.get("pooling", "GeM"),
        coordinates=param.get("coordinates", "cartesian"),
        grid_size=grid_size,
        normalize_embeddings=param.get("normalize_embeddings", False),
        compute_dtype=param.get("COMPUTE_DTYPE", param.get("compute_dtype")),
    )
