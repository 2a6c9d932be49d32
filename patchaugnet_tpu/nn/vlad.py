"""NetVLAD aggregation heads (flax.linen).

TPU-native equivalents of the three loupe variants in the reference:

  - :class:`NetVLADBase`            <- patch_aug_net loupe ``NetVLADBase``
                                       (loupe.py:159-222): soft-assignment
                                       VLAD, output ``(B, C, K)``,
                                       intra-normalised over C.
  - :class:`GatingContext`          <- loupe.py:332-361 / pptnet loupe:107-136
                                       / PointNetVlad.py:84-113 (identical).
  - :class:`SpatialPyramidNetVLAD`  <- patch_aug_net loupe
                                       ``SpatialPyramidNetVLAD``
                                       (loupe.py:225-329) with all six
                                       aggregation types (0=FC, 1/4/5=AFA
                                       combos, 2=APFA2 [the paper's],
                                       3=max-pool).
  - :class:`PPTSpatialPyramidNetVLAD`<- pptnet loupe ``SpatialPyramidNetVLAD``
                                       (pptnet loupe.py:73-105): per-scale
                                       flatten + single FC + BN + gating.
  - :class:`NetVLADLoupe`           <- PointNetVlad.py:12-81: VLAD +
                                       double L2 + FC + BN + gating.

All matmuls are MXU-shaped (N x C x K contractions); inputs are
channels-last ``(B, N, C)`` point features (the reference's
``(B, C, N, 1)`` transposed).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import AdaptiveFeatureAggregator
from .core import batch_norm, l2_normalize


def _scaled_normal(feature_size: int):
    return nn.initializers.normal(stddev=1.0 / math.sqrt(feature_size))


class NetVLADBase(nn.Module):
    """Soft-assignment VLAD: ``(B, N, C) -> (B, C, K)``."""

    feature_size: int
    cluster_size: int
    add_batch_norm: bool = True
    # Mixed-precision compute dtype: the two N-sized einsums (assignment
    # and residual aggregation — the HBM movers at N=4096) run with
    # bf16 inputs and f32 MXU accumulation; softmax, the (B, C, K)
    # residual subtraction and the intra-norm stay f32. None = exact f32.
    dtype: Optional[jnp.dtype] = None
    # Point-axis sharding (parallel/sharded_model.py): when the N axis of
    # ``x`` is a shard_map-local slice of a mesh-sharded cloud, name the
    # mesh axis here — the two N-reductions (``a_sum`` and the residual
    # einsum) finish with a psum over ICI; the per-point work (assignment
    # matmul, BN, softmax) stays local. Eval-only: BN batch stats would
    # otherwise reduce over the local shard (the point-sharded TRAIN
    # path runs this module on global arrays instead —
    # parallel/sharded_train.py). None = single-device.
    psum_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.psum_axis is not None and train:
            raise ValueError(
                "psum_axis is an eval-serving path: train-mode BN would "
                "compute per-shard batch stats (use the GSPMD global "
                "apply in parallel/sharded_train.py for training)"
            )
        init = _scaled_normal(self.feature_size)
        cluster_w = self.param(
            "cluster_weights", init, (self.feature_size, self.cluster_size)
        )
        cluster_w2 = self.param(
            "cluster_weights2", init, (1, self.feature_size, self.cluster_size)
        )
        xc = x if self.dtype is None else x.astype(self.dtype)
        wc = cluster_w if self.dtype is None else cluster_w.astype(self.dtype)
        activation = jnp.einsum(
            "bnc,ck->bnk", xc, wc, preferred_element_type=jnp.float32
        )
        if self.add_batch_norm:
            # reference normalises the flattened (B*N, K) activations
            # (loupe.py:198-200); flax BN reduces over (B, N) — identical.
            activation = batch_norm(name="bn1")(
                activation, use_running_average=not train
            )
        else:
            bias = self.param("cluster_biases", init, (self.cluster_size,))
            activation = activation + bias
        activation = jax.nn.softmax(activation, axis=-1)   # (B, N, K)
        a_sum = jnp.sum(activation, axis=1, keepdims=True) # (B, 1, K)
        ac = activation if self.dtype is None else activation.astype(self.dtype)
        vlad = jnp.einsum(
            "bnk,bnc->bck", ac, xc, preferred_element_type=jnp.float32
        )
        if self.psum_axis is not None:
            a_sum = jax.lax.psum(a_sum, self.psum_axis)
            vlad = jax.lax.psum(vlad, self.psum_axis)
        a = a_sum * cluster_w2                             # (B, C, K)
        vlad = vlad - a
        return l2_normalize(vlad, axis=1)                  # intra-norm over C


class GatingContext(nn.Module):
    """Context gating over a ``(B, D)`` descriptor."""

    dim: int
    add_batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        w = self.param(
            "gating_weights", _scaled_normal(self.dim), (self.dim, self.dim)
        )
        gates = x @ w
        if self.add_batch_norm:
            gates = batch_norm(name="bn1")(gates, use_running_average=not train)
        else:
            b = self.param("gating_biases", _scaled_normal(self.dim), (self.dim,))
            gates = gates + b
        return x * jax.nn.sigmoid(gates)


def _flatten_ck(v: jax.Array) -> jax.Array:
    """``(B, C, K) -> (B, C*K)`` in the reference's channel-major order."""
    b, c, k = v.shape
    return v.reshape(b, c * k)


class SpatialPyramidNetVLAD(nn.Module):
    """Multi-scale VLAD with six aggregation modes (PatchAugNet variant).

    Takes a list of per-scale point features ``[(B, N_i, C_i)]`` and
    returns ``(B, output_dim)``. ``aggregation_type=2`` (APFA2) is the
    paper's cross-scale-and-region AFA (loupe.py:255-256, 301-303).
    """

    feature_size: Sequence[int]
    max_samples: Sequence[int]
    cluster_size: Sequence[int]
    output_dim: Sequence[int]
    gating: bool = False
    aggregation_type: int = 2
    add_batch_norm: bool = True
    # Compute dtype for the per-scale VLAD cores (the N-sized work);
    # the AFA/FC heads after aggregation are (B, C*K)-sized and stay f32.
    dtype: Optional[jnp.dtype] = None
    # Per-scale psum axes (see NetVLADBase.psum_axis): entry i names the
    # mesh axis sharding features[i]'s point dim, or None for replicated
    # scales. Only the finest scale scales with N in PatchAugNet, so a
    # typical value is (None, None, "points").
    psum_axes: Optional[Sequence[Optional[str]]] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], *, train: bool = False) -> jax.Array:
        assert len(features) == len(self.feature_size)
        v_list = [
            NetVLADBase(
                self.feature_size[i],
                self.cluster_size[i],
                self.add_batch_norm,
                dtype=self.dtype,
                psum_axis=(
                    self.psum_axes[i] if self.psum_axes is not None else None
                ),
                name=f"vlad{i}",
            )(features[i], train=train)
            for i in range(len(features))
        ]                                                   # [(B, C, K_i)]
        sum_k = sum(self.cluster_size)
        c0, d0 = self.feature_size[0], self.output_dim[0]
        t = self.aggregation_type

        if t == 0:
            v = jnp.concatenate(v_list, axis=-1)            # (B, C, sumK)
            w = self.param("hidden_weights", _scaled_normal(c0), (c0 * sum_k, d0))
            vlad = _flatten_ck(v) @ w
            vlad = batch_norm(name="bn")(vlad, use_running_average=not train)
            vlad = l2_normalize(vlad, axis=-1)
        elif t == 1:
            scaled = [
                AdaptiveFeatureAggregator(
                    self.output_dim[i], self.cluster_size[i], self.output_dim[i],
                    name=f"afa_scale{i}",
                )(jnp.swapaxes(v_list[i], -1, -2), train=train)[:, None, :]
                for i in range(len(v_list))
            ]                                               # [(B, 1, C)]
            v = jnp.concatenate(scaled, axis=1)             # (B, S, C)
            vlad = AdaptiveFeatureAggregator(
                d0, len(self.feature_size), d0, name="afa"
            )(v, train=train)
        elif t == 2:
            v = jnp.concatenate(v_list, axis=-1)            # (B, C, sumK)
            vlad = AdaptiveFeatureAggregator(d0, sum_k, d0, name="afa")(
                jnp.swapaxes(v, -1, -2), train=train
            )
        elif t == 3:
            v = jnp.concatenate(v_list, axis=-1)
            vlad = jnp.max(v, axis=-1)                      # (B, C)
            vlad = l2_normalize(vlad, axis=-1)
        elif t == 4:
            scaled = [
                AdaptiveFeatureAggregator(
                    self.output_dim[i], self.cluster_size[i], self.output_dim[i],
                    name=f"afa_scale{i}",
                )(jnp.swapaxes(v_list[i], -1, -2), train=train)[:, :, None]
                for i in range(len(v_list))
            ]                                               # [(B, C, 1)]
            v = jnp.concatenate(scaled, axis=-1)            # (B, C, S)
            w = self.param(
                "hidden_weights", _scaled_normal(c0), (c0 * len(self.feature_size), d0)
            )
            vlad = _flatten_ck(v) @ w
            vlad = batch_norm(name="bn")(vlad, use_running_average=not train)
            vlad = l2_normalize(vlad, axis=-1)
        elif t == 5:
            per_scale = []
            for i, v in enumerate(v_list):
                ci, ki, di = self.feature_size[i], self.cluster_size[i], self.output_dim[i]
                w = self.param(f"hidden_weights{i}", _scaled_normal(ci), (ci * ki, di))
                h = _flatten_ck(v) @ w
                h = batch_norm(name=f"bn{i}")(h, use_running_average=not train)
                per_scale.append(l2_normalize(h, axis=-1)[:, None, :])
            v = jnp.concatenate(per_scale, axis=1)          # (B, S, C)
            vlad = AdaptiveFeatureAggregator(
                d0, len(self.feature_size), d0, name="afa"
            )(v, train=train)
        else:
            raise ValueError(f"unknown aggregation_type {t}")

        if self.gating:
            vlad = GatingContext(d0, self.add_batch_norm, name="context_gating")(
                vlad, train=train
            )
        return vlad


class PPTSpatialPyramidNetVLAD(nn.Module):
    """PPT-Net's 4-scale SPVLAD (pptnet loupe.py:73-105).

    Per-scale VLAD flattened to ``(B, C*K_i)``, concatenated, one FC to
    ``output_dim``, BN, optional gating.
    """

    feature_size: Sequence[int]
    max_samples: Sequence[int]
    cluster_size: Sequence[int]
    output_dim: Sequence[int]
    gating: bool = True
    add_batch_norm: bool = True
    dtype: Optional[jnp.dtype] = None
    # Per-scale psum axes (see SpatialPyramidNetVLAD.psum_axes) — PPT-Net
    # sharding uses (None, None, None, "points"): only the finest of the
    # four scales carries the N axis.
    psum_axes: Optional[Sequence[Optional[str]]] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], *, train: bool = False) -> jax.Array:
        flats = []
        for i, f in enumerate(features):
            v = NetVLADBase(
                self.feature_size[i],
                self.cluster_size[i],
                self.add_batch_norm,
                dtype=self.dtype,
                psum_axis=(
                    self.psum_axes[i] if self.psum_axes is not None else None
                ),
                name=f"vlad{i}",
            )(f, train=train)
            flats.append(_flatten_ck(v))
        vlad = jnp.concatenate(flats, axis=-1)
        c0, d0 = self.feature_size[0], self.output_dim[0]
        w = self.param(
            "hidden_weights", _scaled_normal(c0), (c0 * sum(self.cluster_size), d0)
        )
        vlad = vlad @ w
        vlad = batch_norm(name="bn2")(vlad, use_running_average=not train)
        if self.gating:
            vlad = GatingContext(d0, self.add_batch_norm, name="context_gating")(
                vlad, train=train
            )
        return vlad


class NetVLADLoupe(nn.Module):
    """PointNetVLAD's aggregation head (PointNetVlad.py:12-81).

    ``(B, N, C) -> (B, output_dim)``: VLAD, intra-norm, flatten
    (channel-major: the torch view of ``(B, C, K)``,
    PointNetVlad.py:67-71), global L2, FC, BN, gating.
    """

    feature_size: int
    max_samples: int
    cluster_size: int
    output_dim: int
    gating: bool = True
    add_batch_norm: bool = True
    dtype: Optional[jnp.dtype] = None
    # Point-axis sharding (see NetVLADBase.psum_axis): the VLAD's two
    # N-reductions finish with a psum over ICI; FC/BN/gating on the
    # pooled (B, D) run replicated. Eval-only.
    psum_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        vlad = NetVLADBase(
            self.feature_size,
            self.cluster_size,
            self.add_batch_norm,
            dtype=self.dtype,
            psum_axis=self.psum_axis,
            name="base",
        )(x, train=train)                                   # (B, C, K)
        flat = _flatten_ck(vlad)                            # (B, C*K)
        flat = l2_normalize(flat, axis=-1)
        w = self.param(
            "hidden1_weights",
            _scaled_normal(self.feature_size),
            (self.cluster_size * self.feature_size, self.output_dim),
        )
        out = flat @ w
        out = batch_norm(name="bn2")(out, use_running_average=not train)
        if self.gating:
            out = GatingContext(self.output_dim, self.add_batch_norm, name="context_gating")(
                out, train=train
            )
        return out
