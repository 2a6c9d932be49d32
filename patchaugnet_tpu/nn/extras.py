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


def _instance_norm_seq(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free InstanceNorm over the sequence axis of ``(B, N, C)``
    (the reference MLP's ``nn.InstanceNorm1d`` with torch's default
    affine=False, feat_processor.py:13-25)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _MessageMLP(nn.Module):
    """The AttentionalPropagation message MLP [2d, 2d, d] with
    InstanceNorm+ReLU between layers (feat_processor.py:13-25, 55-63)."""

    d_model: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(2 * self.d_model, name="fc0")(x)
        x = nn.relu(_instance_norm_seq(x))
        return nn.Dense(
            self.d_model, bias_init=nn.initializers.zeros, name="fc1"
        )(x)


class AttentionalGNN(nn.Module):
    """SuperGlue-style alternating self/cross attention over two point
    sets (feat_processor.py AttentionalGNN): MLP-message residual
    updates. With all-'self' layer types the two streams are
    independent; pass one set twice (or use :meth:`single`) for the
    reference's self-only mode (feat_processor.py:80-89)."""

    d_model: int
    nhead: int = 4
    layer_types: Sequence[str] = ("self", "cross", "self", "cross")

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array):
        for i, kind in enumerate(self.layer_types):
            attn = MultiheadAttention(self.d_model, self.nhead, name=f"attn{i}")
            mlp = _MessageMLP(self.d_model, name=f"mlp{i}")
            if kind == "self":
                m0 = attn(x0, x0, x0)
                m1 = attn(x1, x1, x1)
            else:
                m0 = attn(x0, x1, x1)
                m1 = attn(x1, x0, x0)
            x0 = x0 + mlp(jnp.concatenate([x0, m0], axis=-1))
            x1 = x1 + mlp(jnp.concatenate([x1, m1], axis=-1))
        return x0, x1


# ------------------------------------------------- geometric encoders
def nn_angle_jax(c: jax.Array, k: int = 3) -> jax.Array:
    """Cosine of angles between each point's edge to every other point
    and its k nearest-neighbour edges — jittable version of
    utils.geometry.nn_angle (reference utils/train_util.py:242-277).

    Args: c ``(b, m, 3)``. Returns ``(b, k, m, m)``.
    """
    from .. import ops

    idx, _ = ops.knn(c, None, k + 1)
    idx = idx[..., 1:]                                      # drop self
    c2 = jax.vmap(lambda pts, i: pts[i])(c, idx)            # (b, m, k, 3)
    c01 = c[:, None, :, :] - c[:, :, None, :]               # (b, m, m, 3)
    c02 = c2 - c[:, :, None, :]                             # (b, m, k, 3)
    c01n = c01 / jnp.maximum(
        jnp.linalg.norm(c01, axis=-1, keepdims=True), 1e-8
    )
    c02n = c02 / jnp.maximum(
        jnp.linalg.norm(c02, axis=-1, keepdims=True), 1e-8
    )
    return jnp.einsum("bmkd,bmjd->bkmj", c02n, c01n)


class AbsCoordEncoder(nn.Module):
    """``(B, N, 3) -> (B, N, d)`` (feat_processor.py:105-120)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.relu(nn.LayerNorm()(nn.Dense(self.embed_dim)(x)))


class DistanceEncoder(nn.Module):
    """All-pairs-distance row embedding (feat_processor.py:120-139)."""

    embed_dim: int
    max_dist: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        centered = x - jnp.mean(x, axis=1, keepdims=True)
        d = jnp.sqrt(
            jnp.maximum(
                jnp.sum(
                    (centered[:, :, None, :] - centered[:, None, :, :]) ** 2, -1
                ),
                0.0,
            )
        )                                                   # (B, N, N)
        if self.max_dist is not None:
            d = jnp.minimum(d, self.max_dist)
        d = d / jnp.maximum(jnp.max(d), 1e-8)
        return nn.relu(nn.LayerNorm()(nn.Dense(self.embed_dim)(d)))


class AngleEncoder(nn.Module):
    """kNN-edge angle embedding, max-pooled over the k edges
    (feat_processor.py:142-164)."""

    embed_dim: int
    angle_k: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = nn_angle_jax(x, self.angle_k)                   # (b, k, m, m)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        a = nn.relu(nn.LayerNorm()(nn.Dense(self.embed_dim)(a)))  # (b, k, m, d)
        return jnp.max(a, axis=1)                           # (b, m, d)


class GeoEncoder(nn.Module):
    """Geometric structure encoder dispatch (feat_processor.py:167-188):
    abs_coord | nn_dist | nn_angle | anything else = dist + angle."""

    encode_type: str
    element_dim: int
    angle_k: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.encode_type == "abs_coord":
            return AbsCoordEncoder(self.element_dim, name="encoder")(x)
        if self.encode_type == "nn_dist":
            return DistanceEncoder(self.element_dim, name="encoder")(x)
        if self.encode_type == "nn_angle":
            return AngleEncoder(self.element_dim, self.angle_k, name="encoder")(x)
        return DistanceEncoder(self.element_dim, name="geo_encoder")(x) + AngleEncoder(
            self.element_dim, self.angle_k, name="angle_encoder"
        )(x)


# ------------------------------------------------------ feat processors
def _pool_seq(x: jax.Array, pool: str) -> jax.Array:
    """avg / max / gem over the sequence axis of ``(B, N, C)`` -> (B, C)
    (the reference pools (b, d, n, 1) to (b, d, 1, 1), pool.py:23-31)."""
    if pool == "avg":
        return jnp.mean(x, axis=1)
    if pool == "max":
        return jnp.max(x, axis=1)
    if pool == "gem":
        # GeMPooling's fixed p=3 formula (pool.py:5-21)
        return jnp.mean(jnp.maximum(x, 1e-6) ** 3.0, axis=1) ** (1.0 / 3.0)
    raise ValueError(f"not support pooling way: {pool}")


class _FeatProcessorCore(nn.Module):
    """Shared machinery of Single/PairwiseFeatProcessor
    (feat_processor.py:191-353): geo-encode positions into local
    features, add/cat the global feature, embed, optional NetVLAD
    aggregation, optional GNN interaction, optional pooling."""

    config: dict

    def setup(self):
        cfg = self.config
        assert cfg["embed_dim"] % 2 == 0
        if cfg["use_geo_encoder"]:
            self.geo_encoder = GeoEncoder(
                cfg["geo_encode_type"], cfg["local_dim"],
                cfg.get("angle_k", 3),
            )
        self.mlp_fc = nn.Dense(cfg["embed_dim"])
        self.mlp_ln = nn.LayerNorm()
        if cfg["use_vlad"]:
            from .vlad import NetVLADBase

            self.vlad = NetVLADBase(
                feature_size=cfg["embed_dim"], cluster_size=cfg["cluster_size"]
            )
        if len(cfg["layer_names"]) > 0:
            self.norm1 = nn.LayerNorm()
            self.gnn_layer = AttentionalGNN(
                cfg["embed_dim"], nhead=4, layer_types=tuple(cfg["layer_names"])
            )

    @property
    def out_dim(self) -> int:
        cfg = self.config
        if cfg["use_pool"]:
            return cfg["embed_dim"]
        n = cfg["cluster_size"] if cfg["use_vlad"] else cfg["num_local"]
        return n * cfg["embed_dim"]

    def _embed(self, x_global, x_local, x_position):
        cfg = self.config
        if cfg["use_geo_encoder"]:
            x_local = x_local + self.geo_encoder(x_position)
        if cfg["add_or_cat"] == "add":
            feat = x_global[:, None, :] + x_local
        elif cfg["add_or_cat"] == "cat":
            g = jnp.broadcast_to(
                x_global[:, None, :], (*x_local.shape[:2], x_global.shape[-1])
            )
            feat = jnp.concatenate([g, x_local], axis=-1)
        else:
            feat = x_local
        feat = nn.relu(self.mlp_ln(self.mlp_fc(feat)))
        if cfg["use_vlad"]:
            # (B, N, C) -> (B, C, K) -> (B, K, C)
            feat = jnp.swapaxes(self.vlad(feat), 1, 2)
        return feat

    def _finish(self, feat):
        if self.config["use_pool"]:
            return _pool_seq(feat, self.config["pool"])
        return feat


class SingleFeatProcessor(_FeatProcessorCore):
    """``(x_global (B, D), x_local (B, N, D), x_position (B, N, 3)) ->
    (B, embed_dim)`` pooled or ``(B, n, embed_dim)``
    (feat_processor.py:191-262). Self-attention interaction only."""

    def __call__(self, x_global, x_local, x_position):
        feat = self._embed(x_global, x_local, x_position)
        if len(self.config["layer_names"]) > 0:
            feat = self.norm1(feat)
            feat, _ = self.gnn_layer(feat, feat)
        return self._finish(feat)


class PairwiseFeatProcessor(_FeatProcessorCore):
    """Two-cloud variant with shared weights and (optionally) cross
    attention between the sets (feat_processor.py:265-353)."""

    def __call__(self, x_global, x_local, x_position,
                 y_global, y_local, y_position):
        xf = self._embed(x_global, x_local, x_position)
        yf = self._embed(y_global, y_local, y_position)
        if len(self.config["layer_names"]) > 0:
            xf, yf = self.norm1(xf), self.norm1(yf)
            xf, yf = self.gnn_layer(xf, yf)
        return self._finish(xf), self._finish(yf)
