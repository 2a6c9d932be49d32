"""Geometry helpers: bbox IoU, grid overlap ratio, correspondences,
rotations.

TPU-native port of the numeric helpers in ``utils/util.py``:
  - :func:`iou_2d` / :func:`iou_3d` (:85-125)
  - :func:`compute_overlap_ratio` (:127-203) — the reference's
    O(points + cells) python loops become vectorised numpy histograms
  - :func:`get_overlap_indices` (:226-253) — bidirectional
    nearest-neighbour correspondences within ``max_dist``
  - rotation helpers (:256-296)
"""
from __future__ import annotations

from typing import Sequence, Set, Tuple

import numpy as np


def iou_2d(box1: Sequence[float], box2: Sequence[float]) -> float:
    """IoU of axis-aligned 2D boxes ``[x1, y1, x2, y2]``."""
    area1 = (box1[2] - box1[0]) * (box1[3] - box1[1])
    area2 = (box2[2] - box2[0]) * (box2[3] - box2[1])
    x1, y1 = max(box1[0], box2[0]), max(box1[1], box2[1])
    x2, y2 = min(box1[2], box2[2]), min(box1[3], box2[3])
    if x1 >= x2 or y1 >= y2:
        return 0.0
    inter = (x2 - x1) * (y2 - y1)
    return inter / (area1 + area2 - inter)


def iou_3d(box1: Sequence[float], box2: Sequence[float]) -> float:
    """IoU of axis-aligned 3D boxes ``[x1, y1, z1, x2, y2, z2]``."""
    v1 = (box1[3] - box1[0]) * (box1[4] - box1[1]) * (box1[5] - box1[2])
    v2 = (box2[3] - box2[0]) * (box2[4] - box2[1]) * (box2[5] - box2[2])
    lo = [max(box1[i], box2[i]) for i in range(3)]
    hi = [min(box1[i + 3], box2[i + 3]) for i in range(3)]
    if any(lo[i] >= hi[i] for i in range(3)):
        return 0.0
    inter = (hi[0] - lo[0]) * (hi[1] - lo[1]) * (hi[2] - lo[2])
    return inter / (v1 + v2 - inter)


def _grid_occupancy(points: np.ndarray, mins: np.ndarray, shape, resolution: float):
    ids = ((points - mins) / resolution).astype(np.int64)
    flat = np.ravel_multi_index(tuple(ids.T), shape, mode="clip")
    occ = np.zeros(int(np.prod(shape)), bool)
    occ[flat] = True
    return occ


def compute_overlap_ratio(
    points1: np.ndarray,
    points2: np.ndarray,
    use_2d: bool = True,
    use_grid: bool = True,
    grid_resolution: float = 1.0,
) -> float:
    """Grid-based overlap IoU of two clouds (util.py:127-203), with the
    per-point / per-cell loops replaced by vectorised occupancy masks."""
    points1 = np.asarray(points1).reshape(-1, 3)
    points2 = np.asarray(points2).reshape(-1, 3)
    d = 2 if use_2d else 3
    p1, p2 = points1[:, :d], points2[:, :d]
    min1, max1 = p1.min(0), p1.max(0)
    min2, max2 = p2.min(0), p2.max(0)
    if use_2d:
        bbox_iou = iou_2d([*min1, *max1], [*min2, *max2])
    else:
        bbox_iou = iou_3d([*min1, *max1], [*min2, *max2])
    if bbox_iou <= 0.0 or not use_grid:
        return bbox_iou
    mins = np.minimum(min1, min2)
    maxs = np.maximum(max1, max2)
    shape = tuple((((maxs - mins) / grid_resolution).astype(np.int64) + 1).tolist())
    occ1 = _grid_occupancy(p1, mins, shape, grid_resolution)
    occ2 = _grid_occupancy(p2, mins, shape, grid_resolution)
    inter = np.logical_and(occ1, occ2).sum()
    union = occ1.sum() + occ2.sum() - inter
    return float(inter) / max(float(union), 1.0)


def get_overlap_indices(
    pc1: np.ndarray, pc2: np.ndarray, max_dist: float = 0.2
) -> Tuple[Set[int], Set[int]]:
    """Bidirectional NN correspondences within ``max_dist``
    (util.py:226-253), batched through sklearn KDTree queries."""
    from sklearn.neighbors import KDTree

    pc1, pc2 = np.asarray(pc1), np.asarray(pc2)
    tree1, tree2 = KDTree(pc1), KDTree(pc2)
    indices1: Set[int] = set()
    indices2: Set[int] = set()
    d21, i21 = tree2.query(pc1)
    hit = d21[:, 0] <= max_dist
    indices1 |= set(np.where(hit)[0].tolist())
    indices2 |= set(i21[hit, 0].tolist())
    d12, i12 = tree1.query(pc2)
    hit = d12[:, 0] <= max_dist
    indices2 |= set(np.where(hit)[0].tolist())
    indices1 |= set(i12[hit, 0].tolist())
    return indices1, indices2


def rotation_matrix_z(angle_rad: float) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def apply_transform(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """Apply a 4x4 homogeneous transform to ``(N, 3)`` points."""
    r, t = transform[:3, :3], transform[:3, 3]
    return points @ r.T + t


def relative_rotation_error(r1: np.ndarray, r2: np.ndarray) -> float:
    """RRE in degrees (cmp_stat.py comparison metric)."""
    cos = (np.trace(r1.T @ r2) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def relative_translation_error(t1: np.ndarray, t2: np.ndarray) -> float:
    return float(np.linalg.norm(np.asarray(t1) - np.asarray(t2)))
