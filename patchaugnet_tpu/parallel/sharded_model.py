"""Full point-axis-sharded PatchAugNet eval forward.

SURVEY §5.7's scaling story made whole-MODEL (VERDICT r4 next #5 went
whole-layer; this composes the layers): the reference caps clouds at
N=4096 on one GPU (place_recognition/patch_aug_net/models/
patch_aug_net.py:110-139 hard-codes the pyramid on one device); here the
point axis of arbitrarily large clouds rides a ``points`` mesh axis and
only the stages that actually scale with N touch the mesh:

  - **SA level 0** (N -> SAMPLING[0]): :func:`~.sharded_ops.sharded_sa_level`
    — sharded FPS / kNN / gathers, replicated SharedMLP on the
    (B, npoint, k) tables.
  - **SA levels 1-2, FP levels 2-1**: replicated — their inputs are
    (B, SAMPLING[0], C) and smaller, independent of N.
  - **FP level 0** (back to N points): embarrassingly parallel along the
    sharded unknown axis — 3-NN of each local point against the
    replicated SAMPLING[0] centres needs no collective at all
    (:func:`sharded_fp_level`).
  - **Fine-scale NetVLAD**: per-point assignment/softmax stay local; the
    two N-reductions finish with one psum over ICI
    (``NetVLADBase.psum_axis``). The coarse/mid VLAD heads and the AFA
    head run replicated inside the same shard_map.

Geometry (FPS/kNN/3-NN indices) is bit-identical to the single-device
forward; the descriptor differs only by the psum's reassociation of the
two N-sums (~1e-7 rel, tests assert 1e-5). Eval-only: train-mode BN
would need cross-shard batch stats (the reference never trains beyond
one GPU either — train_place_recognition.py:546-548 is plain
DataParallel over the batch, which ``build_parallel_train_step``
already covers).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.backbone import PointNet2FPModule, PointNet2SAModule
from ..nn import (
    GroupSA,
    PPTSpatialPyramidNetVLAD,
    SharedMLP,
    SpatialPyramidNetVLAD,
    l2_normalize,
)
from .sharded_ops import sharded_sa_level


def _subtree(variables: Dict[str, Any], *names: str) -> Dict[str, Any]:
    """Extract a submodule's variable columns (params / batch_stats)."""
    out = {}
    for col, tree in variables.items():
        t = tree
        for nm in names:
            t = t[nm]
        out[col] = t
    return out


def sharded_fp_level(
    fp_module: PointNet2FPModule,
    fp_vars: Dict[str, Any],
    unknown_xyz: jax.Array,
    known_xyz: jax.Array,
    unknown_feats: Optional[jax.Array],
    known_feats: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str = "points",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """One feature-propagation level with the UNKNOWN axis sharded.

    3-NN interpolation (ops/grouping.py:186-193) is per-unknown-point
    against the small replicated known set, and the fusion SharedMLP is
    pointwise, so the whole level runs shard-local — zero collectives.
    Output keeps the unknown axis sharded ``P(axis_name)``. Eval-only
    (train-mode BN would see per-shard stats; the point-sharded TRAIN
    path applies the module on global arrays instead —
    parallel/sharded_train.py).
    """
    def local(u_xyz, k_xyz, u_f, k_f, fv):
        return fp_module.apply(fv, u_xyz, k_xyz, u_f, k_f, train=False)

    rep = P(batch_axis, None, None)
    shd = P(batch_axis, axis_name, None)
    if unknown_feats is None:
        fn = shard_map(
            lambda u, k, f, fv: local(u, k, None, f, fv),
            mesh=mesh,
            in_specs=(shd, rep, rep, P()),
            out_specs=shd,
            check_vma=False,
        )
        return fn(unknown_xyz, known_xyz, known_feats, fp_vars)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(shd, rep, shd, rep, P()),
        out_specs=shd,
        check_vma=False,
    )
    return fn(unknown_xyz, known_xyz, unknown_feats, known_feats, fp_vars)


def sharded_patchaugnet_descriptor(
    variables: Dict[str, Any],
    param: Dict[str, Any],
    x: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "points",
    batch_axis: Optional[str] = None,
) -> Tuple[jax.Array, List[jax.Array]]:
    """PatchAugNet global-descriptor forward over a point-sharded mesh.

    Args:
      variables: the full :class:`~..models.PatchAugNet` variables dict
        (params + batch_stats), replicated.
      param: the model's config dict (configs/patch_aug_net.yaml keys).
      x: ``(b, n, 3)`` clouds with the n axis sharded ``P(axis_name)``
        (n divisible by the mesh axis size; no 4096 cap).
      batch_axis: optional second mesh axis sharding the batch (dp x sp).

    Returns:
      ``(desc, fp_features)`` matching ``PatchAugNetOutput.global_desc``
      / ``.fp_features`` of the single-device eval forward: desc
      ``(b, OUTPUT_DIM)`` replicated along ``axis_name``; fp_features
      ``[(b, SAMPLING[1], C), (b, SAMPLING[0], C), (b, n, C)]`` with the
      last one point-sharded. Dilated kNN in eval mode is the plain kNN
      (ops/knn.py:89-112), so the sharded exact kNN reproduces it;
      KNN_APPROX_RECALL is ignored here (this path is always exact).
    """
    p = param
    sap, knn_k, dil = p["SAMPLING"], p["KNN"], p.get("KNN_DILATION", 1)
    fs = p["FEATURE_SIZE"]
    cdt = p.get("COMPUTE_DTYPE")
    cdt = jnp.dtype(cdt) if cdt is not None else None
    if x.ndim == 4:
        x = x.squeeze(1)
    xyz = x

    # --- SA0: the only N-scaling abstraction level (widths
    # patch_aug_net.py:124-132 = models/patch_aug_net.py sa_specs) ---
    mlp0 = SharedMLP((32, 32, 64), dtype=cdt)
    mlp0_vars = _subtree(variables, "sa0", "mlp")
    xyz1, _, _, feats1 = sharded_sa_level(
        lambda g: mlp0.apply(mlp0_vars, g, train=False),
        xyz,
        x,
        npoint=sap[0],
        nsample=knn_k[0],
        mesh=mesh,
        axis_name=axis_name,
        batch_axis=batch_axis,
    )

    # --- SA1 / SA2: (b, sap[0], .) tables — replicated ---
    sa1 = PointNet2SAModule(
        npoint=sap[1], nsample=knn_k[1], mlp=(64, 64, 256),
        knn_dilation=dil, dtype=cdt,
    )
    o1 = sa1.apply(_subtree(variables, "sa1"), xyz1, feats1, train=False)
    sa2 = PointNet2SAModule(
        npoint=sap[2], nsample=knn_k[2], mlp=(256, 256, 512),
        knn_dilation=dil, dtype=cdt,
    )
    o2 = sa2.apply(
        _subtree(variables, "sa2"), o1.new_xyz, o1.features, train=False
    )
    l_xyz = [xyz, xyz1, o1.new_xyz, o2.new_xyz]
    l_feats: List[Optional[jax.Array]] = [x, feats1, o1.features, o2.features]

    # --- FP2 / FP1: replicated ---
    fp2 = PointNet2FPModule(mlp=(256, fs[2]), dtype=cdt)
    l_feats[2] = fp2.apply(
        _subtree(variables, "fp2"),
        l_xyz[2], l_xyz[3], l_feats[2], l_feats[3], train=False,
    )
    fp1 = PointNet2FPModule(mlp=(256, fs[1]), dtype=cdt)
    l_feats[1] = fp1.apply(
        _subtree(variables, "fp1"),
        l_xyz[1], l_xyz[2], l_feats[1], l_feats[2], train=False,
    )

    # --- FP0: back to the N sharded points, shard-local ---
    fp0 = PointNet2FPModule(mlp=(256, 256, fs[0]), dtype=cdt)
    unknown_feats = l_feats[0] if p.get("USE_ORIGIN_PC_IN_FP", True) else None
    l_feats[0] = sharded_fp_level(
        fp0,
        _subtree(variables, "fp0"),
        l_xyz[0], l_xyz[1], unknown_feats, l_feats[1],
        mesh=mesh, axis_name=axis_name, batch_axis=batch_axis,
    )

    # coarse -> fine, as the reference returns them (patch_aug_net.py:191)
    fp_features = [l_feats[2], l_feats[1], l_feats[0]]

    # --- aggregation: fine-scale VLAD psum-reduces its two N-sums;
    # coarse/mid heads + AFA run replicated inside the same shard_map ---
    agg = SpatialPyramidNetVLAD(
        feature_size=fs,
        max_samples=p["MAX_SAMPLES"],
        cluster_size=p["CLUSTER_SIZE"],
        output_dim=p["OUTPUT_DIM"],
        gating=p.get("GATING", False),
        aggregation_type=p.get("AGGREGATION_TYPE", 2),
        add_batch_norm=True,
        dtype=cdt,
        psum_axes=(None, None, axis_name),
    )
    agg_vars = _subtree(variables, "aggregation")
    rep = P(batch_axis, None, None)
    desc = shard_map(
        lambda f2, f1, f0, av: agg.apply(av, [f2, f1, f0], train=False),
        mesh=mesh,
        in_specs=(rep, rep, P(batch_axis, axis_name, None), P()),
        out_specs=P(batch_axis, None),
        check_vma=False,
    )(fp_features[0], fp_features[1], fp_features[2], agg_vars)

    if cdt is not None:
        # surface contract matches models/patch_aug_net.py:146-151
        desc = desc.astype(jnp.float32)
        fp_features = [f.astype(jnp.float32) for f in fp_features]
    return desc, fp_features


def sharded_pointnetvlad_descriptor(
    variables: Dict[str, Any],
    param: Dict[str, Any],
    x: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "points",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """PointNetVLAD global-descriptor forward over a point-sharded mesh.

    The flat architecture (PointNetVlad.py:180-259) is per-point except
    for four N-reductions, so the WHOLE model runs inside one shard_map:
    the two STN global max-pools finish with a ``pmax`` over ICI (max of
    local maxes == global max, bit-exact), and the VLAD's two N-sums
    finish with a ``psum`` (``NetVLADBase.psum_axis``; ~1e-7 rel
    reassociation). Conv-stack BN in eval mode applies running averages
    pointwise, and FC/BN/gating past the VLAD see the replicated
    ``(b, D)`` descriptor — both shard-local.

    Args:
      variables: the full :class:`~..models.PointNetVLAD` variables dict,
        replicated (the sharded module tree is identical — ``shard_axis``
        only inserts collectives).
      param: config dict (``NUM_POINTS``, ``FEATURE_OUTPUT_DIM``,
        optional ``COMPUTE_DTYPE``).
      x: ``(b, n, 3)`` clouds, n sharded ``P(axis_name)`` (no 4096 cap).

    Returns: ``(b, FEATURE_OUTPUT_DIM)`` descriptor, replicated along
    ``axis_name`` — matches the single-device model output.
    """
    from ..models import PointNetVLAD

    cdt = param.get("COMPUTE_DTYPE")
    model = PointNetVLAD(
        num_points=param["NUM_POINTS"],
        output_dim=param["FEATURE_OUTPUT_DIM"],
        compute_dtype=None if cdt is None else cdt,
        shard_axis=axis_name,
    )
    fn = shard_map(
        lambda v, c: model.apply(v, c, train=False),
        mesh=mesh,
        in_specs=(P(), P(batch_axis, axis_name, None)),
        out_specs=P(batch_axis, None),
        check_vma=False,
    )
    return fn(variables, x)


def sharded_pptnet_descriptor(
    variables: Dict[str, Any],
    param: Dict[str, Any],
    x: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "points",
    batch_axis: Optional[str] = None,
    use_normalize: bool = True,
) -> Tuple[jax.Array, List[jax.Array]]:
    """PPT-Net global-descriptor forward over a point-sharded mesh.

    Same decomposition as :func:`sharded_patchaugnet_descriptor` for the
    4-level pyramid (models/pptnet.py): SA0 sharded (its GroupSA runs
    replicated on the pooled ``(b, SAMPLING[0], 64)`` table), SA1-3 and
    FP3-1 replicated, FP0 shard-local, and the finest of the four
    SPVLAD scales psum-reduces its two N-sums. Returns
    ``(desc, fp_features)`` matching ``PPTNetOutput`` fields; eval-only.
    """
    p = param
    sap, knn_k, fs, gp = p["SAMPLING"], p["KNN"], p["FEATURE_SIZE"], p["GROUP"]
    cdt = p.get("COMPUTE_DTYPE")
    cdt = jnp.dtype(cdt) if cdt is not None else None
    if x.ndim == 4:
        x = x.squeeze(1)
    xyz = x

    # --- SA0 sharded; widths pptnet.py:76-83 (= models/pptnet.py sa_specs)
    mlp0 = SharedMLP((32, 32, 64), dtype=cdt)
    mlp0_vars = _subtree(variables, "sa0", "mlp")
    xyz1, _, _, feats1 = sharded_sa_level(
        lambda g: mlp0.apply(mlp0_vars, g, train=False),
        xyz,
        x,
        npoint=sap[0],
        nsample=knn_k[0],
        mesh=mesh,
        axis_name=axis_name,
        batch_axis=batch_axis,
    )
    # grouped self-attention on the pooled (b, sap[0], 64) — replicated
    sa0_att = GroupSA(64, gp, dtype=cdt)
    feats1 = sa0_att.apply(
        _subtree(variables, "sa0", "sa"), feats1, train=False
    )

    # --- SA1-3 replicated ---
    widths = [(64, 64, 128), (128, 128, 256), (256, 256, 512)]
    l_xyz = [xyz, xyz1]
    l_feats: List[Optional[jax.Array]] = [x, feats1]
    for i, w in enumerate(widths, start=1):
        sa = PointNet2SAModule(
            npoint=sap[i], nsample=knn_k[i], mlp=w, gp=gp, dtype=cdt
        )
        o = sa.apply(
            _subtree(variables, f"sa{i}"), l_xyz[i], l_feats[i], train=False
        )
        l_xyz.append(o.new_xyz)
        l_feats.append(o.features)

    # --- FP3-1 replicated (mlps pptnet.py:85-88) ---
    fp_specs = [
        (256, 256, fs[0]),
        (256, fs[1]),
        (256, fs[2]),
        (256, fs[3]),
    ]
    for i in range(3, 0, -1):
        fp = PointNet2FPModule(mlp=fp_specs[i], dtype=cdt)
        l_feats[i] = fp.apply(
            _subtree(variables, f"fp{i}"),
            l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1], train=False,
        )

    # --- FP0 shard-local ---
    fp0 = PointNet2FPModule(mlp=fp_specs[0], dtype=cdt)
    l_feats[0] = sharded_fp_level(
        fp0,
        _subtree(variables, "fp0"),
        l_xyz[0], l_xyz[1], l_feats[0], l_feats[1],
        mesh=mesh, axis_name=axis_name, batch_axis=batch_axis,
    )
    fp_features = [l_feats[3], l_feats[2], l_feats[1], l_feats[0]]

    # --- 4-scale SPVLAD, finest scale psum-reduced ---
    agg = PPTSpatialPyramidNetVLAD(
        feature_size=fs,
        max_samples=p["MAX_SAMPLES"],
        cluster_size=p["CLUSTER_SIZE"],
        output_dim=p["OUTPUT_DIM"],
        gating=p["GATING"],
        add_batch_norm=True,
        dtype=cdt,
        psum_axes=(None, None, None, axis_name),
    )
    agg_vars = _subtree(variables, "aggregation")
    rep = P(batch_axis, None, None)

    def agg_local(f3, f2, f1, f0, av):
        d = agg.apply(av, [f3, f2, f1, f0], train=False)
        return l2_normalize(d, axis=-1) if use_normalize else d

    desc = shard_map(
        agg_local,
        mesh=mesh,
        in_specs=(rep, rep, rep, P(batch_axis, axis_name, None), P()),
        out_specs=P(batch_axis, None),
        check_vma=False,
    )(fp_features[0], fp_features[1], fp_features[2], fp_features[3], agg_vars)

    if cdt is not None:
        desc = desc.astype(jnp.float32)
        fp_features = [f.astype(jnp.float32) for f in fp_features]
    return desc, fp_features
