"""PointNetVLAD (flax, channels-last).

TPU-native rebuild of ``place_recognition/pointnet_vlad/PointNetVlad.py``:
STN input transform, optional STN feature transform, 1x1-conv stack to
1024-d per-point features (all Dense over channels-last), NetVLAD loupe
head. Reference construction (train_place_recognition.py:82-85):
``PointNetVlad(global_feat=True, feature_transform=True, max_pool=False,
output_dim=256, num_points=4096)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import NetVLADLoupe, STN3D, batch_norm


class PointNetFeat(nn.Module):
    """Per-point 1024-d features (PointNetVlad.py:180-232).

    The conv stack uses BN always; the STNs use ``use_bn=False``
    (PointNetVlad.py:183-184). Final conv5+bn5 has no ReLU
    (PointNetVlad.py:222).
    """

    num_points: int = 4096
    feature_transform: bool = True
    max_pool: bool = False
    # Mixed-precision compute dtype for the conv stack (STNs stay f32 —
    # they produce the geometric transforms). None = exact f32 path.
    dtype: jnp.dtype | None = None
    # Point-axis sharding (parallel/sharded_model.py): mesh axis name the
    # N axis of ``x`` is sharded over. Both STNs finish their global
    # max-pools with a pmax over ICI; everything else is per-point.
    shard_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        # x: (B, N, 3)
        trans = STN3D(
            k=3, use_bn=False, pool_axis=self.shard_axis, name="stn"
        )(x, train=train)
        x = jnp.einsum("bnd,bde->bne", x, trans, preferred_element_type=jnp.float32)

        def block(h, f, name, act=True):
            h = nn.Dense(f, dtype=self.dtype, name=name)(h)
            h = batch_norm(name=f"{name}_bn", dtype=self.dtype)(
                h, use_running_average=not train
            )
            return nn.relu(h) if act else h

        x = block(x, 64, "conv1")
        x = block(x, 64, "conv2")
        if self.feature_transform:
            f_trans = STN3D(
                k=64, use_bn=False, pool_axis=self.shard_axis,
                name="feature_trans",
            )(x, train=train)
            x = jnp.einsum(
                "bnc,bcd->bnd", x, f_trans, preferred_element_type=jnp.float32
            )
        x = block(x, 64, "conv3")
        x = block(x, 128, "conv4")
        x = block(x, 1024, "conv5", act=False)
        if self.max_pool:
            pooled = jnp.max(x, axis=1)                    # (B, 1024)
            if self.shard_axis is not None:
                pooled = jax.lax.pmax(pooled, self.shard_axis)
            return pooled
        return x                                           # (B, N, 1024)


class PointNetVLAD(nn.Module):
    """Full model: ``(B, N, 3) -> (B, output_dim)`` global descriptor."""

    num_points: int = 4096
    output_dim: int = 256
    feature_transform: bool = True
    # Mixed-precision serving (see patch_aug_net.py COMPUTE_DTYPE):
    # bf16 conv stack + VLAD einsums, f32 params/accumulation/output.
    compute_dtype: jnp.dtype | None = None
    # Point-axis sharding: set to the mesh axis name under shard_map to
    # run the whole forward with the N axis sharded — the two STN
    # max-pools finish with pmax, the VLAD's two N-reductions with psum
    # (parallel/sharded_model.py::sharded_pointnetvlad_descriptor).
    # Eval-only (NetVLADBase guards train mode).
    shard_axis: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if x.ndim == 4:                                    # accept (B, 1, N, 3)
            x = x.squeeze(1)
        feat = PointNetFeat(
            self.num_points,
            self.feature_transform,
            max_pool=False,
            dtype=self.compute_dtype,
            shard_axis=self.shard_axis,
            name="point_net",
        )(x, train=train)
        out = NetVLADLoupe(
            feature_size=1024,
            max_samples=self.num_points,
            cluster_size=64,
            output_dim=self.output_dim,
            gating=True,
            add_batch_norm=True,
            dtype=self.compute_dtype,
            psum_axis=self.shard_axis,
            name="net_vlad",
        )(feat, train=train)
        if self.compute_dtype is not None:
            out = out.astype(jnp.float32)
        return out
