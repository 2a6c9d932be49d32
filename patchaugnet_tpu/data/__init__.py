"""Data engine: registry, scene dataset, tuple sampler, retrieval."""
from .dataset_info import DatasetInfo, dataset_info_dict, data_root, DATA_ROOT_ENV
from .pointclouds import (
    load_pc_file,
    load_pc_files,
    normalize_point_cloud,
    normalize_point_clouds,
    abnormalize_point_cloud,
    rotate_point_cloud,
    rotate_point_cloud_deg,
    jitter_point_cloud,
)
from .scene_dataset import SceneDataset, QueryPosNegTuple
from .tuple_dataset import PlaceRecognitionDataset, TupleBatch
from .retrieval import (
    topk_neighbors,
    recall_precision,
    RecallResult,
    hard_negatives,
)
from .augment import (
    jitter_points,
    remove_random_points,
    remove_random_block,
    random_translation,
    random_rotation,
    random_flip,
    train_transform,
    train_set_transform,
)
from .overlap import (
    OverlapEntry,
    load_overlap_pb,
    save_overlap_pb,
    synthetic_overlaps,
    build_correspondences,
)

__all__ = [
    "DatasetInfo",
    "dataset_info_dict",
    "data_root",
    "DATA_ROOT_ENV",
    "load_pc_file",
    "load_pc_files",
    "normalize_point_cloud",
    "normalize_point_clouds",
    "abnormalize_point_cloud",
    "rotate_point_cloud",
    "rotate_point_cloud_deg",
    "jitter_point_cloud",
    "SceneDataset",
    "QueryPosNegTuple",
    "PlaceRecognitionDataset",
    "TupleBatch",
    "topk_neighbors",
    "recall_precision",
    "RecallResult",
    "hard_negatives",
    "OverlapEntry",
    "load_overlap_pb",
    "save_overlap_pb",
    "synthetic_overlaps",
    "build_correspondences",
    "jitter_points",
    "remove_random_points",
    "remove_random_block",
    "random_translation",
    "random_rotation",
    "random_flip",
    "train_transform",
    "train_set_transform",
]
