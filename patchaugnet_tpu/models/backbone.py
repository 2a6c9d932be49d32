"""PointNet++ backbone machinery shared by PPT-Net and PatchAugNet.

TPU-native equivalents of:
  - ``PointNet2SAModule``  (patch_aug_net.py:195-314, pptnet.py:137-243):
    FPS -> gather -> EdgeConv grouping (kNN, optional dilation) ->
    SharedMLP -> neighbour max-pool, optionally followed by grouped
    self-attention (PPT-Net, pptnet.py:179).
  - ``PointNet2FPModule``  (patch_aug_net.py:317-363, pptnet.py:285-330):
    3-NN inverse-distance interpolation + SharedMLP fusion.
  - the index-provenance chains mapping every level's centre/sample
    indices back to the original cloud (patch_aug_net.py:169-177,
    pptnet.py:111-120).

Everything is channels-last and static-shape; one forward is a single
XLA program (the reference launches ~9 CUDA kernel groups per SA level).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from ..nn import SharedMLP, GroupSA


class SALevelOutput(NamedTuple):
    new_xyz: jax.Array        # (B, npoint, 3)
    center_idx: jax.Array     # (B, npoint) indices into this level's input
    sample_idx: jax.Array     # (B, npoint, nsample) indices into this level's input
    features: jax.Array       # (B, npoint, C_out)


class PointNet2SAModule(nn.Module):
    """Set-abstraction level with EdgeConv grouping."""

    npoint: int
    nsample: int
    mlp: Sequence[int]          # output widths (reference spec minus input dim)
    knn_dilation: int = 1
    gp: Optional[int] = None    # grouped self-attention groups (PPT-Net)
    use_xyz: bool = True
    # TPU PartialReduce kNN at this recall target (None = exact top_k)
    knn_approx_recall: Optional[float] = None
    # Mixed-precision compute dtype for the feature path (geometry —
    # FPS/kNN over xyz — always runs f32 so index selection is
    # bit-identical to the exact path). None = f32.
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: jax.Array, *, train: bool = False
    ) -> SALevelOutput:
        center_idx = ops.farthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather(xyz, center_idx)
        center_feats = ops.gather(features, center_idx)
        grouped = ops.query_and_group_edge(
            xyz,
            new_xyz,
            features,
            center_feats,
            nsample=self.nsample,
            knn_dilation=self.knn_dilation,
            use_xyz=self.use_xyz,
            approx_recall=self.knn_approx_recall,
        )
        h = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped.new_features, train=train
        )
        h = jnp.max(h, axis=2)                             # neighbour max-pool
        if self.gp is not None:
            h = GroupSA(self.mlp[-1], self.gp, dtype=self.dtype, name="sa")(
                h, train=train
            )
        return SALevelOutput(new_xyz, center_idx, grouped.sample_idx, h)


class MSGLevelOutput(NamedTuple):
    new_xyz: jax.Array        # (B, npoint, 3)
    center_idx: jax.Array     # (B, npoint)
    sample_idx: jax.Array     # (B, npoint, sum(nsamples)) concatenated per scale
    features: jax.Array       # (B, npoint, sum(mlp[-1] per scale))


class PointNet2SAModuleMSG(nn.Module):
    """Multi-scale set abstraction (reference ``PointNet2SAModuleMSG``,
    patch_aug_net.py:195-289): one FPS centre set, several groupers at
    different neighbourhood sizes (kNN or ball radius), each with its
    own SharedMLP + neighbour max-pool; per-scale features concatenate
    over channels and per-scale sample indices over the neighbour axis.
    (Every shipped config is single-scale — this closes the declared
    public surface, and ``PointNet2SAModule`` remains the fast path.)"""

    npoint: int
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    radii: Optional[Sequence[Optional[float]]] = None
    knn_dilation: int = 1
    use_xyz: bool = True

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: jax.Array, *, train: bool = False
    ) -> MSGLevelOutput:
        assert len(self.nsamples) == len(self.mlps)
        center_idx = ops.farthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather(xyz, center_idx)
        center_feats = ops.gather(features, center_idx)
        feats_list, idx_list = [], []
        for i, (ns, mlp) in enumerate(zip(self.nsamples, self.mlps)):
            grouped = ops.query_and_group_edge(
                xyz, new_xyz, features, center_feats,
                nsample=ns,
                radius=self.radii[i] if self.radii is not None else None,
                knn_dilation=self.knn_dilation,
                use_xyz=self.use_xyz,
            )
            h = SharedMLP(mlp, name=f"mlp{i}")(grouped.new_features, train=train)
            feats_list.append(jnp.max(h, axis=2))
            idx_list.append(grouped.sample_idx)
        return MSGLevelOutput(
            new_xyz,
            center_idx,
            jnp.concatenate(idx_list, axis=-1),
            jnp.concatenate(feats_list, axis=-1),
        )


class PointNet2FPModule(nn.Module):
    """Feature-propagation level: 3-NN interpolate + SharedMLP."""

    mlp: Sequence[int]
    # See PointNet2SAModule.dtype: 3-NN geometry stays f32; the big
    # known-feature gather moves at the feature dtype (half the HBM
    # bytes of the fp0 gather when upstream features are bf16).
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        unknown_xyz: jax.Array,
        known_xyz: jax.Array,
        unknown_feats: Optional[jax.Array],
        known_feats: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        interp = ops.interpolate_features(unknown_xyz, known_xyz, known_feats)
        if unknown_feats is not None:
            if self.dtype is not None:
                # avoid a silent f32 promotion of the whole concat when
                # one side (the raw xyz at level 0) is still f32
                interp = interp.astype(self.dtype)
                unknown_feats = unknown_feats.astype(self.dtype)
            h = jnp.concatenate([interp, unknown_feats], axis=-1)
        else:
            h = interp
        return SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(h, train=train)


def index_provenance(
    center_idx: Sequence[jax.Array], sample_idx: Sequence[jax.Array]
) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Compose per-level indices into original-cloud indices.

    Mirrors the torch.gather chains at patch_aug_net.py:169-177: level-i
    centre indices index into level-(i-1)'s centres; composing through
    level 0 yields indices into the raw input cloud.
    """
    center_origin = [center_idx[0]]
    sample_origin = [sample_idx[0]]
    for i in range(1, len(center_idx)):
        prev = center_origin[i - 1]                        # (B, m_{i-1})
        c = jnp.take_along_axis(prev, center_idx[i], axis=-1)
        m_i = sample_idx[i].shape[1]
        prev_b = jnp.broadcast_to(
            prev[:, None, :], (prev.shape[0], m_i, prev.shape[1])
        )
        s = jnp.take_along_axis(prev_b, sample_idx[i], axis=-1)
        center_origin.append(c)
        sample_origin.append(s)
    return center_origin, sample_origin
