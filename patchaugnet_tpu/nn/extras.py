"""Auxiliary NN blocks (rerank / pose-estimation support library).

TPU-native equivalents of ``utils/model_util/*`` — the blocks serving
the reference's rerank and pose-estimation sub-projects (SURVEY §2.2:
"none used by the four main models" but part of the public surface):

  - :class:`SEAttention`            <- attention.py:6-36
  - :class:`ChannelAttention` / :class:`SpatialAttention` /
    :class:`CBAM`                   <- attention.py:39-97
  - :class:`GeMPooling`             <- pool.py:5-21
  - :func:`sinusoidal_positional_embedding`
                                    <- position_embedding.py:5-32
  - :class:`TransformerEncoderLayer` (with optional low-rank
    Linformer-style attention)      <- transformer.py:19-102 +
    linear_multihead_attention.py:323-495 (the E/F projections of keys
    and values to a fixed ``proj_k`` length)
  - :class:`AttentionalGNN`         <- feat_processor.py SuperGlue-style
    self/cross message passing

Layout: channels-last ``(B, L, C)`` sequences.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .core import batch_norm


class SEAttention(nn.Module):
    """Squeeze-and-excitation over channels of ``(B, L, C)``."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.mean(x, axis=1)                            # (B, C)
        y = nn.Dense(self.channels // self.reduction, use_bias=False, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, :]


class ChannelAttention(nn.Module):
    """CBAM channel attention (attention.py:39-58): shared MLP over
    mean- and max-pooled channel vectors."""

    channels: int
    ratio: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mlp1 = nn.Dense(self.channels // self.ratio, use_bias=False, name="mlp1")
        mlp2 = nn.Dense(self.channels, use_bias=False, name="mlp2")
        avg = mlp2(nn.relu(mlp1(jnp.mean(x, axis=1))))
        mx = mlp2(nn.relu(mlp1(jnp.max(x, axis=1))))
        gate = jax.nn.sigmoid(avg + mx)
        return x * gate[:, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial attention (attention.py:61-85): [max, mean] channel
    stats -> 1x1 conv -> BN -> ReLU -> softmax over positions."""

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, return_attn: bool = False):
        stats = jnp.stack([jnp.max(x, -1), jnp.mean(x, -1)], axis=-1)  # (B, L, 2)
        att = nn.Dense(1, use_bias=False, name="conv1")(stats)         # (B, L, 1)
        att = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-5, name="bn"
        )(att)
        att = nn.relu(att)
        att = jax.nn.softmax(att[..., 0], axis=-1)[..., None]          # (B, L, 1)
        out = att * x
        if return_attn:
            return out, att
        return out


class CBAM(nn.Module):
    channels: int
    ratio: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False, return_attn: bool = False):
        x = ChannelAttention(self.channels, self.ratio, name="channel")(x)
        return SpatialAttention(name="spatial")(x, train=train, return_attn=return_attn)


class GeMPooling(nn.Module):
    """Generalised-mean pooling over positions of ``(B, L, C)``
    (pool.py:5-21; fixed p, unlike MinkLoc's learned p)."""

    p: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        clamped = jnp.maximum(x, self.eps) ** self.p
        return jnp.mean(clamped, axis=1) ** (1.0 / self.p)


def sinusoidal_positional_embedding(indices: jax.Array, d_model: int) -> jax.Array:
    """``(*,) -> (*, d_model)`` sin/cos embedding, interleaved
    [sin, cos] per frequency (position_embedding.py:25-31)."""
    assert d_model % 2 == 0
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    omega = indices[..., None].astype(jnp.float32) * div    # (*, d/2)
    emb = jnp.stack([jnp.sin(omega), jnp.cos(omega)], axis=-1)
    return emb.reshape(*indices.shape, d_model)


class MultiheadAttention(nn.Module):
    """Standard or Linformer-style (low-rank key/value projection)
    multi-head attention over ``(B, L, C)``."""

    d_model: int
    nhead: int
    proj_k: Optional[int] = None   # Linformer sequence projection length

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        d_head = self.d_model // self.nhead
        wq = nn.Dense(self.d_model, name="q")(q)
        wk = nn.Dense(self.d_model, name="k")(k)
        wv = nn.Dense(self.d_model, name="v")(v)
        if self.proj_k is not None:
            # project the sequence axis of keys/values to proj_k
            # (linear_multihead_attention.py E/F projections)
            wk = jnp.swapaxes(
                nn.Dense(self.proj_k, name="e_proj")(jnp.swapaxes(wk, 1, 2)), 1, 2
            )
            wv = jnp.swapaxes(
                nn.Dense(self.proj_k, name="f_proj")(jnp.swapaxes(wv, 1, 2)), 1, 2
            )
            mask = None                                    # mask undefined post-projection
        b, lq, _ = wq.shape
        lk = wk.shape[1]
        wq = wq.reshape(b, lq, self.nhead, d_head)
        wk = wk.reshape(b, lk, self.nhead, d_head)
        wv = wv.reshape(b, lk, self.nhead, d_head)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", wq, wk, preferred_element_type=jnp.float32
        ) / math.sqrt(d_head)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, wv, preferred_element_type=jnp.float32
        ).reshape(b, lq, self.d_model)
        return nn.Dense(self.d_model, name="out")(out)


class TransformerEncoderLayer(nn.Module):
    """DETR-style encoder layer with optional positional embedding adds
    and optional Linformer attention (transformer.py:19-102)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    linear_attention_k: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        src: jax.Array,
        pos: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        qk = src if pos is None else src + pos
        attn = MultiheadAttention(
            self.d_model, self.nhead, proj_k=self.linear_attention_k, name="self_attn"
        )(qk, qk, src, mask)
        src = nn.LayerNorm(name="norm1")(src + nn.Dropout(
            self.dropout, deterministic=not train, name="drop1")(attn))
        ff = nn.Dense(self.dim_feedforward, name="linear1")(src)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train, name="dropff")(ff)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        return nn.LayerNorm(name="norm2")(src + nn.Dropout(
            self.dropout, deterministic=not train, name="drop2")(ff))


class AttentionalGNN(nn.Module):
    """SuperGlue-style alternating self/cross attention over two point
    sets (feat_processor.py AttentionalGNN): MLP-message residual
    updates."""

    d_model: int
    nhead: int = 4
    layer_types: Sequence[str] = ("self", "cross", "self", "cross")

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array):
        for i, kind in enumerate(self.layer_types):
            attn = MultiheadAttention(self.d_model, self.nhead, name=f"attn{i}")
            mlp = nn.Sequential(
                [nn.Dense(2 * self.d_model), nn.relu, nn.Dense(self.d_model)]
            )
            if kind == "self":
                m0 = attn(x0, x0, x0)
                m1 = attn(x1, x1, x1)
            else:
                m0 = attn(x0, x1, x1)
                m1 = attn(x1, x0, x0)
            x0 = x0 + mlp(jnp.concatenate([x0, m0], axis=-1))
            x1 = x1 + mlp(jnp.concatenate([x1, m1], axis=-1))
        return x0, x1
