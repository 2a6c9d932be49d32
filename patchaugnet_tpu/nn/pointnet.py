"""PointNet-style encoder/decoder blocks (flax.linen, channels-last).

TPU-native equivalents of:
  - ``STN3D``              (patch_aug_net/models/pointnet_autoencoder.py:6-40)
  - ``PointNetEncoder``    (pointnet_autoencoder.py:43-82)
  - ``PointNetDecoder``    (pointnet_autoencoder.py:85-111)
  - ``STN3d``              (pointnet_vlad/PointNetVlad.py:124-177, the
                            use_bn=False variant used by PointNetfeat)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .core import batch_norm


class STN3D(nn.Module):
    """Spatial transformer predicting a ``k x k`` alignment matrix.

    Input ``(B, N, C)`` -> ``(B, k, k)``, initialised at identity via the
    ``+ I`` residual (pointnet_autoencoder.py:37-39). ``use_bn=False``
    mirrors the PointNetVlad STN3d variant (PointNetVlad.py:183:
    ``STN3d(..., use_bn=False)``).
    """

    k: int = 3
    use_bn: bool = True
    # Point-axis sharding (parallel/sharded_model.py): when the N axis of
    # ``x`` is a shard_map-local slice of a mesh-sharded cloud, name the
    # mesh axis here — the global max-pool finishes with a pmax over ICI
    # (max of local maxes == global max, bit-exact). The per-point conv
    # stack and the post-pool FCs stay local. None = single-device.
    pool_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def block(h, f, name):
            h = nn.Dense(f, name=f"{name}")(h)
            if self.use_bn:
                h = batch_norm(name=f"{name}_bn")(h, use_running_average=not train)
            return nn.relu(h)

        h = block(x, 64, "conv1")
        h = block(h, 128, "conv2")
        h = block(h, 1024, "conv3")
        h = jnp.max(h, axis=1)                             # (B, 1024)
        if self.pool_axis is not None:
            h = jax.lax.pmax(h, self.pool_axis)
        h = block(h, 512, "fc1")
        h = block(h, 256, "fc2")
        # fc3 zero-init so the initial transform is the identity
        # (PointNetVlad.py:139-140 zeroes weight and bias).
        h = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="fc3",
        )(h)
        eye = jnp.eye(self.k, dtype=h.dtype).reshape(-1)
        return (h + eye).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    """Global PointNet encoder (pointnet_autoencoder.py:43-82).

    Note: the reference constructs STNs but never applies them in
    ``forward`` — reproduced faithfully (only the MLP path runs).
    """

    embedding_size: int

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def block(h, f, name):
            h = nn.Dense(f, name=name)(h)
            h = batch_norm(name=f"{name}_bn")(h, use_running_average=not train)
            return nn.relu(h)

        h = block(x, 64, "mlp1_0")
        h = block(h, 64, "mlp1_1")
        h = block(h, 64, "mlp2_0")
        h = block(h, 128, "mlp2_1")
        h = block(h, 1024, "mlp2_2")
        h = jnp.max(h, axis=1)
        return nn.Dense(self.embedding_size, name="fc")(h)


class PointNetAutoencoder(nn.Module):
    """Encoder+decoder composite (pointnet_autoencoder.py:114-139)."""

    embedding_size: int
    output_num_points: int = 1024
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        z = PointNetEncoder(self.embedding_size, name="encoder")(x, train=train)
        if self.normalize:
            z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        y = PointNetDecoder(
            self.embedding_size, self.output_num_points, name="decoder"
        )(z, train=train)
        return y, z


class PointNetDecoder(nn.Module):
    """FC decoder: embedding -> ``num_points x 3`` patch with tanh range
    (pointnet_autoencoder.py:85-111)."""

    embedding_size: int
    num_points: int
    output_channels: int = 3

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = False) -> jax.Array:
        h = nn.Dense(1024, name="fc1")(z)
        h = nn.relu(batch_norm(name="bn1")(h, use_running_average=not train))
        h = nn.Dense(1024, name="fc2")(h)
        h = nn.relu(batch_norm(name="bn2")(h, use_running_average=not train))
        h = jnp.tanh(nn.Dense(self.num_points * self.output_channels, name="fc3")(h))
        return h.reshape(-1, self.num_points, self.output_channels)
