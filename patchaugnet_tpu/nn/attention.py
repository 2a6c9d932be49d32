"""Attention blocks (flax.linen, channels-last).

TPU-native equivalents of the attention layers in
``place_recognition/patch_aug_net/models/loupe.py`` and
``place_recognition/pptnet_origin/models/pptnet.py``:

  - :class:`MLPAttention`  <- ``MLPAttentionLayer``   (loupe.py:8-41)
  - :class:`AdaptiveFeatureAggregator` <- same name    (loupe.py:44-66)
  - :class:`GroupSA`       <- ``GroupSALayer`` / ``SA_Layer``
                              (loupe.py:69-114, pptnet.py:246-282 — the
                              two are identical; grouped 1x1 convs with
                              *tied* Q/K weights)
  - :class:`SA`            <- ``SALayer``              (loupe.py:117-156)

Layout note: the reference works on ``(B, C, N)``; here sequences are
channels-last ``(B, N, C)`` so every projection is a Dense over the
trailing axis (one MXU matmul). Attention maps keep the reference's
exact (unusual) normalisation: softmax over the last axis followed by a
division by the column sum over axis 1.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .core import batch_norm, l2_normalize


class MLPAttention(nn.Module):
    """Per-position scalar attention (reference ``MLPAttentionLayer``).

    Input/output ``(B, L, C)``. Scores: channel-max of an MLP, softmax
    over positions; residual ``relu(x + x * w)`` ("way 2",
    loupe.py:34-38).
    """

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array, return_attn: bool = False):
        h = x
        for i, c in enumerate(self.channels[1:]):
            h = nn.Dense(c, use_bias=False, name=f"mlp{i}")(h)
        score = jnp.max(h, axis=-1)                        # (B, L)
        weights = jax.nn.softmax(score, axis=-1)           # (B, L)
        out = nn.relu(x + x * weights[..., None])
        if return_attn:
            return out, weights
        return out


class AdaptiveFeatureAggregator(nn.Module):
    """``B x K x C_in -> B x C_out`` (reference AFA, loupe.py:44-66).

    MLP-attention over the K slots, flatten (channel-major, matching the
    torch ``view`` of a ``(B, C, K)`` tensor), FC, BN, optional L2 norm.
    """

    c_in: int
    k: int
    c_out: int
    l2_norm: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = MLPAttention([self.c_in, self.c_in], name="mlpa")(x)   # (B, K, C)
        b = x.shape[0]
        flat = jnp.swapaxes(x, -1, -2).reshape(b, self.c_in * self.k)
        out = nn.Dense(self.c_out, name="fc")(flat)
        out = batch_norm(name="bn")(out, use_running_average=not train)
        if self.l2_norm:
            out = l2_normalize(out, axis=-1)
        return out


class _GroupedDense(nn.Module):
    """Grouped 1x1 conv over the channel axis: block-diagonal Dense.

    torch ``Conv1d(C, C, 1, groups=gp, bias=False)`` equivalent; weight
    shape ``(gp, C/gp, C/gp)``.
    """

    channels: int
    gp: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:        # (B, N, C)
        cg = self.channels // self.gp
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.gp, cg, cg),
        )
        xg = x.reshape(*x.shape[:-1], self.gp, cg)
        if self.dtype is None:
            out = jnp.einsum(
                "...gi,gio->...go", xg, w, preferred_element_type=jnp.float32
            )
            return out.reshape(x.shape)
        # Low-precision path: unroll the (small, static) group axis into
        # plain 2D dots. The grouped einsum lowers to a dot with a batch
        # dim on both operands plus extra lhs free dims — a form XLA-CPU's
        # DotThunk cannot execute at bf16 (UNIMPLEMENTED: BF16 x BF16 =
        # F32); per-group `...i,io->...o` dots are supported everywhere
        # and tile onto the TPU MXU identically.
        xg = xg.astype(self.dtype)
        w = w.astype(self.dtype)
        out = jnp.stack(
            [
                jnp.einsum(
                    "...i,io->...o",
                    xg[..., g, :],
                    w[g],
                    preferred_element_type=jnp.float32,
                )
                for g in range(self.gp)
            ],
            axis=-2,
        )
        return out.reshape(x.shape).astype(self.dtype)


class GroupSA(nn.Module):
    """Grouped self-attention with tied Q/K weights.

    Reference ``SA_Layer``/``GroupSALayer``: ``q_conv.weight =
    k_conv.weight`` ties the projections (pptnet.py:252-254), so a single
    grouped weight serves both; energy sums over groups.
    Input/output ``(B, N, C)``.
    """

    channels: int
    gp: int
    # Mixed-precision compute dtype: Q/K/V projections and the two
    # (B, N, N)-sized attention matmuls run at this dtype with f32 MXU
    # accumulation; the softmax + column normalisation stay f32.
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        cg = self.channels // self.gp
        if self.dtype is not None:
            x = x.astype(self.dtype)
        qk = _GroupedDense(self.channels, self.gp, dtype=self.dtype, name="qk_conv")
        xq = qk(x).reshape(*x.shape[:-1], self.gp, cg)     # (B, N, gp, C')
        xk = xq                                            # tied weights
        xv = nn.Dense(self.channels, dtype=self.dtype, name="v_conv")(x)
        energy = jnp.einsum(
            "bngc,bmgc->bnm", xq, xk, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(energy, axis=-1)
        attn = attn / (1e-9 + jnp.sum(attn, axis=1, keepdims=True))
        if self.dtype is not None:
            attn = attn.astype(self.dtype)
        # torch: x_r[c, j] = sum_i v[c, i] * attn[i, j]
        x_r = jnp.einsum(
            "bic,bij->bjc", xv, attn, preferred_element_type=jnp.float32
        )
        if self.dtype is not None:
            x_r = x_r.astype(self.dtype)
        x_r = nn.Dense(self.channels, dtype=self.dtype, name="trans_conv")(x - x_r)
        x_r = batch_norm(name="after_norm", dtype=self.dtype)(
            x_r, use_running_average=not train
        )
        return x + nn.relu(x_r)


class SA(nn.Module):
    """Ungrouped self-attention with tied Q/K (reference ``SALayer``)."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        qk = nn.Dense(self.channels, use_bias=False, name="qk_conv")
        xq = qk(x)                                         # (B, N, C)
        xk = xq
        xv = nn.Dense(self.channels, name="v_conv")(x)
        energy = jnp.einsum(
            "bnc,bmc->bnm", xq, xk, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(energy, axis=-1)
        attn = attn / (1e-9 + jnp.sum(attn, axis=1, keepdims=True))
        x_r = jnp.einsum(
            "bic,bij->bjc", xv, attn, preferred_element_type=jnp.float32
        )
        x_r = nn.Dense(self.channels, name="trans_conv")(x - x_r)
        x_r = batch_norm(name="after_norm")(x_r, use_running_average=not train)
        return x + nn.relu(x_r)
