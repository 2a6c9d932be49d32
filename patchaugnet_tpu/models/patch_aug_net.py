"""PatchAugNet (flax, channels-last).

TPU-native rebuild of
``place_recognition/patch_aug_net/models/patch_aug_net.py``:
3-level PointNet++ with EdgeConv grouping + dilated kNN
(patch_aug_net.py:110-139), index provenance back to the original cloud
(:169-177), 3 FP levels, SpatialPyramidNetVLAD aggregation (APFA2 by
default), and the patch-reconstruction branch.

TPU re-architecture of the patch branch: the reference loops over
"related clouds" on the host and runs the decoder per cloud
(patch_aug_net.py:68-103) with repeated device syncs; here the branch is
**vectorised and static-shape** — origin patches, L2-normalised patch
features and reconstructed patches come out of one program, and the
patch-contrast losses select rows with padded index tables (see
losses/patch_contrast.py). ``patch_rows`` restricts the branch to a
fixed-size subset of clouds (the queries+positives that actually feed
the patch losses — the reference's related_cloud_idx, :68-74), cutting
the decoder/chamfer work ~(1+P+N+1)/(1+P)x per train step; ``None``
keeps the whole-batch superset (eval / descriptor dumps).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from ..nn import PointNetDecoder, SpatialPyramidNetVLAD, l2_normalize
from .backbone import PointNet2FPModule, PointNet2SAModule, index_provenance


class PatchData(NamedTuple):
    """Per-cloud patch tensors (level-1 patches: 1024 per cloud)."""

    center_indices: jax.Array       # (B, 1024) original-cloud centre indices
    origin_patches: jax.Array       # (B, 1024, nsample, 3) raw grouped xyz
    patch_features: jax.Array       # (B, 1024, 256) L2-normalised
    reconstructed_patches: Optional[jax.Array]  # (B, 1024, nsample, 3)


class PatchAugNetOutput(NamedTuple):
    global_desc: jax.Array          # (B, 256)
    fp_features: List[jax.Array]    # [(B,128,C), (B,1024,C), (B,4096,C)]
    center_idx_origin: List[jax.Array]
    sample_idx_origin: List[jax.Array]
    patch_data: Optional[PatchData]


class PatchAugNet(nn.Module):
    """``(B, N, 3) -> PatchAugNetOutput``.

    ``param`` mirrors configs/patch_aug_net.yaml keys. ``use_a2a_recon``
    enables the PointNet decoder head (patch_aug_net.py:45-46).
    """

    param: Dict[str, Any]
    use_a2a_recon: bool = True
    use_l2_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        with_patches: bool = False,
        patch_rows: Optional[jax.Array] = None,
    ) -> PatchAugNetOutput:
        if x.ndim == 4:
            x = x.squeeze(1)
        p = self.param
        xyz = x
        sap, knn, dil = p["SAMPLING"], p["KNN"], p.get("KNN_DILATION", 1)
        fs = p["FEATURE_SIZE"]
        use_origin_pc_in_fp = p.get("USE_ORIGIN_PC_IN_FP", True)
        # Mixed-precision serving: COMPUTE_DTYPE "bfloat16" runs the
        # feature path (SharedMLPs, feature gathers, VLAD einsums) at
        # bf16 with f32 params/accumulation/BN-stats; geometry (FPS,
        # kNN, 3-NN) stays f32 so every index matches the exact path,
        # and the returned descriptor/fp features are f32. The forward
        # is HBM-bound (profiles/README.md) — halving feature bytes is
        # the main lever past the f32 roofline.
        cdt = p.get("COMPUTE_DTYPE")
        cdt = jnp.dtype(cdt) if cdt is not None else None

        # SA widths (patch_aug_net.py:124-132): 64, 256, 512.
        sa_specs = [
            (sap[0], knn[0], [32, 32, 64]),
            (sap[1], knn[1], [64, 64, 256]),
            (sap[2], knn[2], [256, 256, 512]),
        ]
        l_xyz, l_feats = [x], [x]
        center_idx, sample_idx = [], []
        for i, (npoint, k, widths) in enumerate(sa_specs):
            out = PointNet2SAModule(
                npoint=npoint,
                nsample=k,
                mlp=widths,
                knn_dilation=dil,
                gp=None,
                knn_approx_recall=p.get("KNN_APPROX_RECALL"),
                dtype=cdt,
                name=f"sa{i}",
            )(l_xyz[i], l_feats[i], train=train)
            l_xyz.append(out.new_xyz)
            l_feats.append(out.features)
            center_idx.append(out.center_idx)
            sample_idx.append(out.sample_idx)

        center_origin, sample_origin = index_provenance(center_idx, sample_idx)

        # FP mlps (patch_aug_net.py:137-139).
        fp_specs = [
            [256, 256, fs[0]],   # fs[1]+c -> 256 -> 256 -> fs[0] (to l0)
            [256, fs[1]],        # fs[2]+64 -> 256 -> fs[1] (to l1)
            [256, fs[2]],        # 512+256 -> 256 -> fs[2] (to l2)
        ]
        for i in range(len(fp_specs) - 1, -1, -1):
            unknown_feats = l_feats[i]
            if i == 0 and not use_origin_pc_in_fp:
                unknown_feats = None
            l_feats[i] = PointNet2FPModule(
                mlp=fp_specs[i], dtype=cdt, name=f"fp{i}"
            )(
                l_xyz[i], l_xyz[i + 1], unknown_feats, l_feats[i + 1], train=train
            )

        # fp_features ordered coarse->fine as the reference returns them
        # (patch_aug_net.py:191): [128-pt, 1024-pt, 4096-pt].
        fp_features = [l_feats[2], l_feats[1], l_feats[0]]

        desc = SpatialPyramidNetVLAD(
            feature_size=fs,
            max_samples=p["MAX_SAMPLES"],
            cluster_size=p["CLUSTER_SIZE"],
            output_dim=p["OUTPUT_DIM"],
            gating=p.get("GATING", False),
            aggregation_type=p.get("AGGREGATION_TYPE", 2),
            add_batch_norm=True,
            dtype=cdt,
            name="aggregation",
        )(fp_features, train=train)
        if cdt is not None:
            # surface contract: descriptors and fp features are f32
            # regardless of the compute dtype (retrieval/top-k consumers
            # assume f32 tables).
            desc = desc.astype(jnp.float32)
            fp_features = [f.astype(jnp.float32) for f in fp_features]

        patch_data = None
        if with_patches:
            # Level-1 patches (vectorised replacement for
            # patch_aug_net.py:68-103); patch_rows = the reference's
            # related_cloud_idx as a static-size index table.
            if patch_rows is not None:
                xyz_p = xyz[patch_rows]
                sample0 = sample_origin[0][patch_rows]
                center0 = center_origin[0][patch_rows]
                pf = fp_features[1][patch_rows]
            else:
                xyz_p, sample0 = xyz, sample_origin[0]
                center0, pf = center_origin[0], fp_features[1]
            origin_patches = ops.group(xyz_p, sample0)         # (R,1024,k,3)
            if self.use_l2_norm:
                pf = l2_normalize(pf, axis=-1)
            recon = None
            if self.use_a2a_recon:
                b, m, c = pf.shape
                recon = PointNetDecoder(
                    embedding_size=fs[1], num_points=knn[0], name="decoder"
                )(pf.reshape(b * m, c), train=train)
                recon = recon.reshape(b, m, knn[0], 3)
            patch_data = PatchData(center0, origin_patches, pf, recon)

        return PatchAugNetOutput(
            desc, fp_features, center_origin, sample_origin, patch_data
        )
