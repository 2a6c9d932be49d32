"""Flax building blocks: SharedMLP, NetVLAD heads, attention, STN/decoders."""
from .core import SharedMLP, MLP, batch_norm, l2_normalize, BN_MOMENTUM, BN_EPS
from .attention import (
    MLPAttention,
    AdaptiveFeatureAggregator,
    GroupSA,
    SA,
)
from .vlad import (
    NetVLADBase,
    GatingContext,
    SpatialPyramidNetVLAD,
    PPTSpatialPyramidNetVLAD,
    NetVLADLoupe,
)
from .pointnet import STN3D, PointNetEncoder, PointNetDecoder, PointNetAutoencoder
from .extras import (
    SEAttention,
    ChannelAttention,
    SpatialAttention,
    CBAM,
    GeMPooling,
    sinusoidal_positional_embedding,
    MultiheadAttention,
    TransformerEncoderLayer,
    AttentionalGNN,
)

__all__ = [
    "SharedMLP",
    "MLP",
    "batch_norm",
    "l2_normalize",
    "BN_MOMENTUM",
    "BN_EPS",
    "MLPAttention",
    "AdaptiveFeatureAggregator",
    "GroupSA",
    "SA",
    "NetVLADBase",
    "GatingContext",
    "SpatialPyramidNetVLAD",
    "PPTSpatialPyramidNetVLAD",
    "NetVLADLoupe",
    "STN3D",
    "PointNetEncoder",
    "PointNetDecoder",
    "PointNetAutoencoder",
    "SEAttention",
    "ChannelAttention",
    "SpatialAttention",
    "CBAM",
    "GeMPooling",
    "sinusoidal_positional_embedding",
    "MultiheadAttention",
    "TransformerEncoderLayer",
    "AttentionalGNN",
]
