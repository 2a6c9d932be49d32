"""Fixed-shape point-cloud ops: the TPU-native replacement for the
reference's four CUDA extension libraries (``libs/pointops``,
``libs/chamfer_dist``, ``libs/emd_module``, ``libs/KNN_CUDA``).

Everything is pure JAX (MXU matmuls + ``lax.top_k`` + gathers) with
Pallas drop-ins for the hot paths under ``patchaugnet_tpu.ops.pallas``.
"""
from .pairwise import pairwise_sqdist, self_sqdist
from .knn import knn, dilated_knn, ball_query, knn_exclude_self
from .fps import farthest_point_sample
from .grouping import (
    gather,
    group,
    three_nn,
    three_interpolate,
    interpolate_features,
    query_and_group,
    query_and_group_edge,
    group_all,
    GroupedEdgeFeatures,
)
from .chamfer import (
    chamfer_sqdists,
    chamfer_l1,
    chamfer_l2,
    chamfer_l2_split,
)
from .emd import auction_emd
from .labelstat import (
    labelstat_ballrange,
    labelstat_idx,
    labelstat_and_ballquery,
    featuredistribute,
    featuregather,
)

__all__ = [
    "pairwise_sqdist",
    "self_sqdist",
    "knn",
    "dilated_knn",
    "ball_query",
    "knn_exclude_self",
    "farthest_point_sample",
    "gather",
    "group",
    "three_nn",
    "three_interpolate",
    "interpolate_features",
    "query_and_group",
    "query_and_group_edge",
    "group_all",
    "GroupedEdgeFeatures",
    "chamfer_sqdists",
    "chamfer_l1",
    "chamfer_l2",
    "chamfer_l2_split",
    "auction_emd",
    "labelstat_ballrange",
    "labelstat_idx",
    "labelstat_and_ballquery",
    "featuredistribute",
    "featuregather",
]
