"""Core NN building blocks (flax.linen, channels-last).

TPU-native equivalents of ``utils/pt_util.py``: the reference implements
shared MLPs as 1x1 ``Conv2d`` stacks over ``(B, C, N, K)`` tensors
(pt_util.py:16-41, 98-200); on TPU a shared MLP over the channel axis is
exactly a ``Dense`` over the trailing axis of a channels-last tensor —
one MXU matmul with everything else fused by XLA.

BatchNorm semantics match torch defaults (pt_util convs use
``nn.BatchNorm*d`` with eps 1e-5, momentum 0.1): flax ``momentum=0.9``
(flax: ra = m*ra + (1-m)*batch) and bias-free convs when followed by BN
(pt_util.py:116 ``bias = bias and (not bn)``).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Matches torch BatchNorm defaults used throughout the reference.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# Compute dtype for mixed-precision inference (params stay f32; flax BN
# keeps running stats and stat reductions in f32 regardless). ``None``
# everywhere = the exact f32 path.
Dtype = Optional[Any]


def batch_norm(
    name: Optional[str] = None,
    *,
    axis_name: Optional[str] = None,
    dtype: Dtype = None,
) -> nn.BatchNorm:
    """BatchNorm with reference-equivalent hyperparameters.

    ``axis_name`` enables cross-device stat sync under shard_map/pjit when
    batch stats must match a single-device run. ``dtype`` is the compute
    dtype (result dtype); statistics always reduce in f32.
    """
    return nn.BatchNorm(
        use_running_average=None,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        axis_name=axis_name,
        dtype=dtype,
        name=name,
    )


class SharedMLP(nn.Module):
    """Stack of Dense(+BN)(+ReLU) over the last axis.

    Equivalent to ``pt_util.SharedMLP`` (pt_util.py:16-41) applied to a
    channels-last tensor of any rank: each 1x1 Conv2d over (B, C, M, K)
    is a Dense over (..., C). With ``bn=True`` the Dense has no bias.
    """

    features: Sequence[int]
    bn: bool = True
    activation: Optional[Callable[[jax.Array], jax.Array]] = nn.relu
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(
                f, use_bias=not self.bn, dtype=self.dtype, name=f"layer{i}"
            )(x)
            if self.bn:
                # torch BN2d normalises over (B, M, K) per channel; flax
                # BatchNorm reduces over all leading axes — identical.
                x = batch_norm(name=f"bn{i}", dtype=self.dtype)(
                    x, use_running_average=not train
                )
            if self.activation is not None:
                x = self.activation(x)
        return x


class MLP(nn.Module):
    """FC stack with optional BN+ReLU per layer (reference ``pt_util.FC``)."""

    features: Sequence[int]
    bn: bool = True
    activation: Optional[Callable[[jax.Array], jax.Array]] = nn.relu
    final_activation: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            act = self.activation if (not last or self.final_activation) else None
            use_bn = self.bn and (not last or self.final_activation)
            x = nn.Dense(f, use_bias=not use_bn, dtype=self.dtype, name=f"fc{i}")(x)
            if use_bn:
                x = batch_norm(name=f"bn{i}", dtype=self.dtype)(
                    x, use_running_average=not train
                )
            if act is not None:
                x = act(x)
        return x


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch ``F.normalize(p=2)`` semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
