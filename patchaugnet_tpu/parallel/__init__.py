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

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "build_parallel_train_step",
    "build_parallel_forward",
    "pad_to_multiple",
]
