"""Utilities: meters, logging, timing, geometry, profiling, viz."""
from .meters import AverageMeter
from .timestamps import timestamp2str
from .logging_util import get_logger, MetricsWriter
from .geometry import (
    iou_2d,
    iou_3d,
    compute_overlap_ratio,
    get_overlap_indices,
    rotation_matrix_z,
    apply_transform,
    relative_rotation_error,
    relative_translation_error,
)
from .profiling import flops, parameter_count, DeviceTimer

__all__ = [
    "AverageMeter",
    "timestamp2str",
    "get_logger",
    "MetricsWriter",
    "iou_2d",
    "iou_3d",
    "compute_overlap_ratio",
    "get_overlap_indices",
    "rotation_matrix_z",
    "apply_transform",
    "relative_rotation_error",
    "relative_translation_error",
    "flops",
    "parameter_count",
    "DeviceTimer",
]
