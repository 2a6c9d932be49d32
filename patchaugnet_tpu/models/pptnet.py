"""PPT-Net (flax, channels-last).

TPU-native rebuild of ``place_recognition/pptnet_origin/models/pptnet.py``:
4-level PointNet++ (4096 -> 1024 -> 256 -> 64 -> 16) with grouped
self-attention after every SA max-pool (pptnet.py:76-88,179), 4 FP
levels, and the PPT 4-scale SPVLAD head (pptnet loupe.py:73-105).
``use_normalize`` distinguishes the ``pptnet`` / ``pptnet_l2_norm``
model types (train_place_recognition.py:76-81).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import PPTSpatialPyramidNetVLAD, l2_normalize
from .backbone import PointNet2FPModule, PointNet2SAModule, index_provenance


class PPTNetOutput(NamedTuple):
    global_desc: jax.Array             # (B, out_dim)
    fp_features: List[jax.Array]       # [(B, 64, C), (B, 256, C), (B, 1024, C), (B, 4096, C)]
    center_idx_origin: List[jax.Array]


class PPTNet(nn.Module):
    """``(B, N, 3) -> (B, 256)`` global descriptor.

    ``param`` mirrors the reference YAML keys (configs/pptnet_origin.yaml):
    SAMPLING, KNN, FEATURE_SIZE, CLUSTER_SIZE, OUTPUT_DIM, MAX_SAMPLES,
    GROUP, GATING.
    """

    param: Dict[str, Any]
    use_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> PPTNetOutput:
        if x.ndim == 4:
            x = x.squeeze(1)
        p = self.param
        sap, knn, fs, gp = p["SAMPLING"], p["KNN"], p["FEATURE_SIZE"], p["GROUP"]
        # COMPUTE_DTYPE "bfloat16": mixed-precision feature path (see
        # patch_aug_net.py — geometry f32, params f32, output f32).
        cdt = p.get("COMPUTE_DTYPE")
        cdt = jnp.dtype(cdt) if cdt is not None else None
        # SA widths per reference (pptnet.py:76-83): 64, 128, 256, 512.
        sa_specs = [
            (sap[0], knn[0], [32, 32, 64]),
            (sap[1], knn[1], [64, 64, 128]),
            (sap[2], knn[2], [128, 128, 256]),
            (sap[3], knn[3], [256, 256, 512]),
        ]
        l_xyz, l_feats = [x], [x]
        center_idx, sample_idx = [], []
        for i, (npoint, k, widths) in enumerate(sa_specs):
            out = PointNet2SAModule(
                npoint=npoint, nsample=k, mlp=widths, gp=gp,
                knn_approx_recall=p.get("KNN_APPROX_RECALL"),
                dtype=cdt, name=f"sa{i}"
            )(l_xyz[i], l_feats[i], train=train)
            l_xyz.append(out.new_xyz)
            l_feats.append(out.features)
            center_idx.append(out.center_idx)
            sample_idx.append(out.sample_idx)

        center_origin, _ = index_provenance(center_idx, sample_idx)

        # FP mlps (pptnet.py:85-88).
        fp_specs = [
            [256, 256, fs[0]],   # fs[1]+3 -> ... (applied last, to l0)
            [256, fs[1]],        # fs[2]+64
            [256, fs[2]],        # fs[3]+128
            [256, fs[3]],        # 512+256
        ]
        for i in range(len(fp_specs) - 1, -1, -1):
            l_feats[i] = PointNet2FPModule(
                mlp=fp_specs[i], dtype=cdt, name=f"fp{i}"
            )(
                l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1], train=train
            )

        fp_features = [l_feats[3], l_feats[2], l_feats[1], l_feats[0]]
        desc = PPTSpatialPyramidNetVLAD(
            feature_size=fs,
            max_samples=p["MAX_SAMPLES"],
            cluster_size=p["CLUSTER_SIZE"],
            output_dim=p["OUTPUT_DIM"],
            gating=p["GATING"],
            add_batch_norm=True,
            dtype=cdt,
            name="aggregation",
        )(fp_features, train=train)
        if self.use_normalize:
            desc = l2_normalize(desc, axis=-1)
        if cdt is not None:
            desc = desc.astype(jnp.float32)
            fp_features = [f.astype(jnp.float32) for f in fp_features]
        return PPTNetOutput(desc, fp_features, center_origin)
