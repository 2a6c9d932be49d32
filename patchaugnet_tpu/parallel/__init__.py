"""Mesh/pjit parallel layer."""
from .mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    build_parallel_train_step,
    build_parallel_forward,
    pad_to_multiple,
)
from .sharded_ops import sharded_knn, sharded_fps, sharded_topk_neighbors

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "build_parallel_train_step",
    "build_parallel_forward",
    "pad_to_multiple",
    "sharded_knn",
    "sharded_fps",
    "sharded_topk_neighbors",
]
