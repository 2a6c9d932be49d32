"""Point-axis-sharded TRAINING (PatchAugNet + PPT-Net descriptor trunks).

Extends parallel/sharded_model.py's eval decomposition to train mode —
the piece the reference cannot express at all: its training caps clouds
at N=4096 on one GPU (place_recognition/train_place_recognition.py:
546-548 is plain batch DataParallel), while here the point axis of the
TRAINING clouds rides a ``points`` mesh axis end to end:

  - forward: the N-scaling geometry (SA0's FPS / kNN / gathers) rides
    the mesh through the same shard_map stages as the eval path
    (:func:`~.sharded_ops.sharded_sa_level`); every stage with
    train-mode BatchNorm applies on GLOBAL arrays so its batch
    statistics reduce over the full (B, N) population under GSPMD —
    correct for ANY mesh layout (points-only or dp x sp) without
    threading per-axis pmeans through the BN stack. Replicated stages
    compute stats on full tables either way.
  - backward: ``jax.grad`` differentiates straight through the
    shard_map geometry and the GSPMD global stages — XLA transposes
    the psums into the matching collectives, and replicated-in
    parameters come back with their gradients psum-reduced over the
    mesh.
  - loss: the place-recognition quadruplet/triplet on the (B*T, D)
    descriptors (losses/metric.py), exactly the single-device
    ``make_loss_fn`` restricted to the descriptor term. The patch
    branch is out of scope by design: patch tables are
    ``(r, SAMPLING[0], ...)``-sized — independent of N — so patch-loss
    training at reference N is already covered by
    ``build_parallel_train_step`` (dp), and a giant-N run would combine
    this trunk with that branch at SAMPLING[0] scale.

Equivalence oracle (tests/test_train.py, points-only and dp x sp on
the 8-device CPU mesh): loss, descriptor and updated batch stats match
the single-device ``make_loss_fn`` step at reassociation tolerance;
gradients under a structural per-leaf rel-L2 bound plus a 2-step
trajectory check — per-leaf grad EQUALITY is not assertable on this
backend (the single-device backward itself flips near-tied neighbour
max-pool routing between schedules; see CLAUDE.md).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh

from ..losses import get_loss_func
from ..models.backbone import PointNet2FPModule, PointNet2SAModule
from ..nn import SharedMLP, SpatialPyramidNetVLAD
from .sharded_model import _subtree
from .sharded_ops import sharded_sa_level


def sharded_patchaugnet_train_forward(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    param: Dict[str, Any],
    x: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "points",
    batch_axis: Optional[str] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Train-mode descriptor forward with the point axis sharded.

    Args:
      params / batch_stats: the PatchAugNet variable columns, replicated.
      param: config dict (configs/patch_aug_net.yaml keys).
      x: ``(b_total, n, 3)`` clouds, n sharded ``P(axis_name)``.

    Returns ``(desc, new_batch_stats)``: the ``(b_total, OUTPUT_DIM)``
    descriptor and the updated batch-stats tree (same structure as the
    input — submodules outside the descriptor trunk carry over
    unchanged).
    """
    p = param
    variables = {"params": params, "batch_stats": batch_stats}
    sap, knn_k, dil = p["SAMPLING"], p["KNN"], p.get("KNN_DILATION", 1)
    fs = p["FEATURE_SIZE"]
    if x.ndim == 4:
        x = x.squeeze(1)
    xyz = x
    new_bs: Dict[str, Any] = dict(batch_stats)

    # --- SA0 sharded; its SharedMLP sees the replicated (b, m, k)
    # gathered table, so train-mode stats are already global ---
    mlp0 = SharedMLP((32, 32, 64))
    mlp0_vars = _subtree(variables, "sa0", "mlp")

    def mlp0_apply(g):
        y, mut = mlp0.apply(mlp0_vars, g, train=True, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    xyz1, _, _, feats1, sa0_stats = sharded_sa_level(
        mlp0_apply, xyz, x,
        npoint=sap[0], nsample=knn_k[0],
        mesh=mesh, axis_name=axis_name, batch_axis=batch_axis,
        mlp_returns_aux=True,
    )
    new_bs["sa0"] = {**batch_stats["sa0"], "mlp": sa0_stats}

    # --- SA1 / SA2 replicated: their tables are (b, SAMPLING[0], .) and
    # smaller, independent of N (dilated kNN's optional shuffle is
    # skipped without a PRNG key — identical in train and eval,
    # ops/knn.py:93-110) ---
    sa1 = PointNet2SAModule(
        npoint=sap[1], nsample=knn_k[1], mlp=(64, 64, 256), knn_dilation=dil
    )
    o1, mut = sa1.apply(
        _subtree(variables, "sa1"), xyz1, feats1,
        train=True, mutable=["batch_stats"],
    )
    new_bs["sa1"] = mut["batch_stats"]
    sa2 = PointNet2SAModule(
        npoint=sap[2], nsample=knn_k[2], mlp=(256, 256, 512), knn_dilation=dil
    )
    o2, mut = sa2.apply(
        _subtree(variables, "sa2"), o1.new_xyz, o1.features,
        train=True, mutable=["batch_stats"],
    )
    new_bs["sa2"] = mut["batch_stats"]
    l_xyz = [xyz, xyz1, o1.new_xyz, o2.new_xyz]
    l_feats = [x, feats1, o1.features, o2.features]

    # --- FP2 / FP1 replicated ---
    fp2 = PointNet2FPModule(mlp=(256, fs[2]))
    l_feats[2], mut = fp2.apply(
        _subtree(variables, "fp2"),
        l_xyz[2], l_xyz[3], l_feats[2], l_feats[3],
        train=True, mutable=["batch_stats"],
    )
    new_bs["fp2"] = mut["batch_stats"]
    fp1 = PointNet2FPModule(mlp=(256, fs[1]))
    l_feats[1], mut = fp1.apply(
        _subtree(variables, "fp1"),
        l_xyz[1], l_xyz[2], l_feats[1], l_feats[2],
        train=True, mutable=["batch_stats"],
    )
    new_bs["fp1"] = mut["batch_stats"]

    # --- FP0 and aggregation on GLOBAL arrays: their train-mode BN
    # layers must reduce batch statistics over the full (B, N)
    # population, so instead of threading per-axis pmeans through every
    # BN we step OUT of shard_map here and let GSPMD partition the
    # global ops (the unknown axis of l_feats[0] stays sharded
    # P(axis_name); reductions are global by construction for ANY mesh
    # layout — points-only or dp x sp). The eval path keeps its
    # zero-collective shard_map staging (sharded_model.py); at train
    # time the backward pass dominates and GSPMD's choices match. ---
    fp0 = PointNet2FPModule(mlp=(256, 256, fs[0]))
    unknown_feats = l_feats[0] if p.get("USE_ORIGIN_PC_IN_FP", True) else None
    l_feats[0], mut = fp0.apply(
        _subtree(variables, "fp0"),
        l_xyz[0], l_xyz[1], unknown_feats, l_feats[1],
        train=True, mutable=["batch_stats"],
    )
    new_bs["fp0"] = mut["batch_stats"]

    agg = SpatialPyramidNetVLAD(
        feature_size=fs,
        max_samples=p["MAX_SAMPLES"],
        cluster_size=p["CLUSTER_SIZE"],
        output_dim=p["OUTPUT_DIM"],
        gating=p.get("GATING", False),
        aggregation_type=p.get("AGGREGATION_TYPE", 2),
        add_batch_norm=True,
    )
    desc, mut = agg.apply(
        _subtree(variables, "aggregation"),
        [l_feats[2], l_feats[1], l_feats[0]],
        train=True, mutable=["batch_stats"],
    )
    new_bs["aggregation"] = mut["batch_stats"]
    return desc, new_bs


def sharded_pptnet_train_forward(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    param: Dict[str, Any],
    x: jax.Array,
    mesh: Mesh,
    *,
    axis_name: str = "points",
    batch_axis: Optional[str] = None,
    use_normalize: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Train-mode PPT-Net descriptor forward with the point axis sharded.

    Same decomposition as :func:`sharded_patchaugnet_train_forward` for
    the 4-level pyramid (models/pptnet.py): SA0's geometry rides the
    mesh (its SharedMLP + GroupSA see replicated tables), SA1-3 / FP3-1
    apply replicated, FP0 + the 4-scale SPVLAD apply on GLOBAL arrays so
    train-mode BN reduces over the full (B, N) population. Returns
    ``(desc, new_batch_stats)``; ``use_normalize`` mirrors the
    ``pptnet_l2_norm`` model variant.
    """
    from ..nn import GroupSA, PPTSpatialPyramidNetVLAD, l2_normalize

    p = param
    variables = {"params": params, "batch_stats": batch_stats}
    sap, knn_k, fs, gp = p["SAMPLING"], p["KNN"], p["FEATURE_SIZE"], p["GROUP"]
    if x.ndim == 4:
        x = x.squeeze(1)
    xyz = x
    new_bs: Dict[str, Any] = dict(batch_stats)

    mlp0 = SharedMLP((32, 32, 64))
    mlp0_vars = _subtree(variables, "sa0", "mlp")

    def mlp0_apply(g):
        y, mut = mlp0.apply(mlp0_vars, g, train=True, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    xyz1, _, _, feats1, sa0_mlp_stats = sharded_sa_level(
        mlp0_apply, xyz, x,
        npoint=sap[0], nsample=knn_k[0],
        mesh=mesh, axis_name=axis_name, batch_axis=batch_axis,
        mlp_returns_aux=True,
    )
    # grouped self-attention on the pooled replicated (b, sap[0], 64)
    sa0_att = GroupSA(64, gp)
    feats1, mut = sa0_att.apply(
        _subtree(variables, "sa0", "sa"), feats1,
        train=True, mutable=["batch_stats"],
    )
    new_bs["sa0"] = {
        **batch_stats["sa0"],
        "mlp": sa0_mlp_stats,
        "sa": mut["batch_stats"],
    }

    widths = [(64, 64, 128), (128, 128, 256), (256, 256, 512)]
    l_xyz = [xyz, xyz1]
    l_feats = [x, feats1]
    for i, w in enumerate(widths, start=1):
        sa = PointNet2SAModule(
            npoint=sap[i], nsample=knn_k[i], mlp=w, gp=gp
        )
        o, mut = sa.apply(
            _subtree(variables, f"sa{i}"), l_xyz[i], l_feats[i],
            train=True, mutable=["batch_stats"],
        )
        new_bs[f"sa{i}"] = mut["batch_stats"]
        l_xyz.append(o.new_xyz)
        l_feats.append(o.features)

    fp_specs = [
        (256, 256, fs[0]),
        (256, fs[1]),
        (256, fs[2]),
        (256, fs[3]),
    ]
    for i in range(3, 0, -1):
        fp = PointNet2FPModule(mlp=fp_specs[i])
        l_feats[i], mut = fp.apply(
            _subtree(variables, f"fp{i}"),
            l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1],
            train=True, mutable=["batch_stats"],
        )
        new_bs[f"fp{i}"] = mut["batch_stats"]

    # FP0 + SPVLAD on GLOBAL arrays (train-mode BN; see the PatchAugNet
    # variant's comment)
    fp0 = PointNet2FPModule(mlp=fp_specs[0])
    l_feats[0], mut = fp0.apply(
        _subtree(variables, "fp0"),
        l_xyz[0], l_xyz[1], l_feats[0], l_feats[1],
        train=True, mutable=["batch_stats"],
    )
    new_bs["fp0"] = mut["batch_stats"]

    agg = PPTSpatialPyramidNetVLAD(
        feature_size=fs,
        max_samples=p["MAX_SAMPLES"],
        cluster_size=p["CLUSTER_SIZE"],
        output_dim=p["OUTPUT_DIM"],
        gating=p["GATING"],
        add_batch_norm=True,
    )
    desc, mut = agg.apply(
        _subtree(variables, "aggregation"),
        [l_feats[3], l_feats[2], l_feats[1], l_feats[0]],
        train=True, mutable=["batch_stats"],
    )
    new_bs["aggregation"] = mut["batch_stats"]
    if use_normalize:
        desc = l2_normalize(desc, axis=-1)
    return desc, new_bs


def build_sharded_train_step(
    cfg: Dict[str, Any],
    mesh: Mesh,
    *,
    axis_name: str = "points",
    batch_axis: Optional[str] = None,
):
    """``step(state, clouds) -> (state, metrics)`` with the point axis of
    the training clouds sharded over ``mesh``.

    Dispatches on ``cfg["model_type"]`` (patch_aug_net default; pptnet /
    pptnet_l2_norm use the PPT-Net forward). The loss is the
    place-recognition term of the single-device ``train.step.make_loss_fn``
    (quadruplet by default, train_place_recognition.py:166-178
    semantics); gradients flow through every shard_map stage and the
    optimizer update runs on the replicated parameters. ``state`` is a
    ``train.state.TrainState``.
    """
    from ..train.step import _split_tuple

    batch_size = cfg["TRAIN_BATCH_SIZE"]
    num_pos = cfg["TRAIN_POSITIVES_PER_QUERY"]
    num_neg = cfg["TRAIN_NEGATIVES_PER_QUERY"]
    m1, m2 = cfg["MARGIN_1"], cfg["MARGIN_2"]
    pr_loss = get_loss_func(cfg.get("LOSS_FUNCTION", "quadruplet"))
    lazy = cfg.get("LOSS_LAZY", True)
    use_min = cfg.get("TRIPLET_USE_BEST_POSITIVES", False)
    ignore_zero = cfg.get("LOSS_IGNORE_ZERO_BATCH", False)
    model_type = cfg.get("model_type", "patch_aug_net")
    if model_type in ("pptnet", "pptnet_l2_norm"):
        def forward(params, batch_stats, clouds):
            return sharded_pptnet_train_forward(
                params, batch_stats, cfg, clouds, mesh,
                axis_name=axis_name, batch_axis=batch_axis,
                use_normalize=model_type == "pptnet_l2_norm",
            )
    else:
        def forward(params, batch_stats, clouds):
            return sharded_patchaugnet_train_forward(
                params, batch_stats, cfg, clouds, mesh,
                axis_name=axis_name, batch_axis=batch_axis,
            )

    def loss_fn(params, batch_stats, clouds):
        desc, new_bs = forward(params, batch_stats, clouds)
        q, pos, neg, other = _split_tuple(desc, batch_size, num_pos, num_neg)
        loss = pr_loss(
            q, pos, neg, other, m1, m2,
            use_min=use_min, lazy=lazy, ignore_zero_loss=ignore_zero,
        )
        return loss, new_bs

    def step(state, clouds):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, clouds
        )
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, {"place_recognition": loss, "total": loss}

    return step
