"""Jitted train/eval steps.

The reference's per-batch driver logic (train_place_recognition.py:
221-392 — forward, quadruplet loss, patch a2a chamfer, a2b contrast,
weighted sum, backward, step) compiled into ONE XLA program per batch:
no host round-trips inside the hot loop, unlike the reference's python
a2b loop with repeated ``.cpu()`` syncs (:316-322).

Patch inputs (correspondence tables + related-cloud mask) are built
host-side from overlap records (data/overlap.py) and passed as padded
arrays, so the step is fully static-shape and pjit-shardable.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as L
from ..losses.patch_contrast import PatchCorrespondences
from ..ops import farthest_point_sample
from .state import TrainState


def _global_desc(out):
    return out if isinstance(out, jax.Array) else out.global_desc


def _split_tuple(desc: jax.Array, batch_size: int, num_pos: int, num_neg: int):
    """(B*T, D) -> query (B,1,D), pos (B,P,D), neg (B,N,D), other (B,1,D)
    — run_model's view+split (train_place_recognition.py:166-168)."""
    d = desc.reshape(batch_size, 1 + num_pos + num_neg + 1, -1)
    return (
        d[:, :1],
        d[:, 1 : 1 + num_pos],
        d[:, 1 + num_pos : 1 + num_pos + num_neg],
        d[:, 1 + num_pos + num_neg :],
    )


def make_loss_fn(model, cfg: Dict[str, Any]) -> Callable:
    """Loss closure shared by the single-chip and pjit train steps.

    Signature: ``loss_fn(params, batch_stats, clouds, corr, cloud_mask)
    -> (total, (metrics, new_batch_stats))``.
    """
    model_type = cfg["model_type"]
    batch_size = cfg["TRAIN_BATCH_SIZE"]
    num_pos = cfg["TRAIN_POSITIVES_PER_QUERY"]
    num_neg = cfg["TRAIN_NEGATIVES_PER_QUERY"]
    m1, m2 = cfg["MARGIN_1"], cfg["MARGIN_2"]
    lazy = cfg.get("LOSS_LAZY", True)
    use_min = cfg.get("TRIPLET_USE_BEST_POSITIVES", False)
    ignore_zero = cfg.get("LOSS_IGNORE_ZERO_BATCH", False)
    pr_loss = L.get_loss_func(cfg.get("LOSS_FUNCTION", "quadruplet"))
    use_patches = model_type == "patch_aug_net" and (
        cfg.get("use_patch_recon", False) or cfg.get("use_patch_feature_contrast", False)
    )
    use_a2a = use_patches and cfg.get("use_patch_recon", False)
    use_a2b = use_patches and cfg.get("use_patch_feature_contrast", False)
    w = {
        "place_recognition": cfg.get("weight_place_recognition", 1.0),
        "patch_recon_a2a": cfg.get("weight_patch_recon", 0.25),
        "patch_recon_a2b": cfg.get("weight_patch_feature_contrast", 0.25),
    }

    # The patch losses only ever touch queries + positives (the
    # reference's related_cloud_idx, patch_aug_net.py:68-74): run the
    # decoder/chamfer on that fixed-size subset instead of the whole
    # (1+P+N+1)-wide tuple batch — ~6x less patch-branch work at the
    # reference config.
    max_patch_clouds = cfg.get(
        "A2A_MAX_CLOUDS", batch_size * (1 + num_pos)
    )

    # optional full rematerialisation of the forward in the backward
    # pass (cfg REMAT: true): trades ~1/3 more forward FLOPs for not
    # keeping the gather-heavy activations live — the TPU-idiomatic way
    # to fit larger tuple batches in HBM
    def _apply(params, batch_stats, clouds, patch_rows):
        kwargs = {}
        if use_patches:
            kwargs = {"with_patches": True, "patch_rows": patch_rows}
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            clouds,
            train=True,
            mutable=["batch_stats"],
            **kwargs,
        )

    if cfg.get("REMAT", False):
        _apply = jax.checkpoint(_apply)

    def loss_fn(params, batch_stats, clouds, corr, cloud_mask):
        sel = None
        sel_valid = None
        if use_patches:
            total_clouds = clouds.shape[0]
            r = min(max_patch_clouds, total_clouds)
            sel = jnp.nonzero(cloud_mask, size=r, fill_value=0)[0].astype(
                jnp.int32
            )
            sel_valid = jnp.arange(r) < jnp.sum(cloud_mask)
        out, mutated = _apply(params, batch_stats, clouds, sel)
        desc = _global_desc(out)
        q, p, n, o = _split_tuple(desc, batch_size, num_pos, num_neg)
        metrics = {}
        metrics["place_recognition"] = pr_loss(
            q, p, n, o, m1, m2, use_min=use_min, lazy=lazy, ignore_zero_loss=ignore_zero
        )
        if use_a2a:
            pd = out.patch_data
            metrics["patch_recon_a2a"] = L.patch_chamfer_loss(
                pd.origin_patches, pd.reconstructed_patches, sel_valid
            )
        if use_a2b:
            pd = out.patch_data
            # remap correspondence cloud ids (flat-batch positions) to
            # subset rows; only valid sel entries scatter (fill rows
            # park at index total_clouds and are sliced away)
            scatter_to = jnp.where(sel_valid, sel, total_clouds)
            pos_of = (
                jnp.zeros((total_clouds + 1,), jnp.int32)
                .at[scatter_to]
                .set(jnp.arange(sel.shape[0], dtype=jnp.int32))[:total_clouds]
            )
            covered = (
                jnp.zeros((total_clouds + 1,), bool)
                .at[scatter_to]
                .set(True)[:total_clouds]
            )
            corr_sub = corr._replace(
                row_q_cloud=pos_of[corr.row_q_cloud],
                row_n_cloud=pos_of[corr.row_n_cloud],
                # rows referencing clouds outside the subset cannot be
                # evaluated there (they never occur in the real loop:
                # corr rows come from nn_dict = the masked clouds)
                row_valid=corr.row_valid
                & covered[corr.row_q_cloud]
                & covered[corr.row_n_cloud],
            )
            metrics["patch_recon_a2b"] = L.patch_contrastive_loss(
                out.patch_data.patch_features, corr_sub, m1
            )
        total = sum(w[k] * v for k, v in metrics.items())
        metrics = {k: w[k] * v for k, v in metrics.items()}
        metrics["total"] = total
        return total, (metrics, mutated["batch_stats"])

    return loss_fn


def build_train_step(model, cfg: Dict[str, Any]) -> Callable:
    """Returns jitted ``step(state, clouds, corr, cloud_mask) ->
    (state, metrics)``.

    clouds: ``(B*T, N, 3)`` flattened tuple batch.
    corr: :class:`PatchCorrespondences` (ignored for non-patch models).
    cloud_mask: ``(B*T,)`` bool — clouds participating in the a2a loss
    (the reference's related-clouds set, patch_aug_net.py:68-74).
    """
    loss_fn = make_loss_fn(model, cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState,
        clouds: jax.Array,
        corr: PatchCorrespondences,
        cloud_mask: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, clouds, corr, cloud_mask
        )
        # loss_sum > 1e-10 gate (train_place_recognition.py:390-392):
        # skip the optimizer step on an all-zero loss.
        nonzero = metrics["total"] > 1e-10
        new_state = state.apply_gradients(
            jax.tree_util.tree_map(lambda g: jnp.where(nonzero, g, 0.0), grads),
            new_bs,
        )
        return new_state, metrics

    return train_step


def build_forward_fn(model, cfg: Dict[str, Any]) -> Callable:
    """Jitted descriptor extractor ``(variables, (B, N, 3)) -> (B, D)``
    for make_descs / eval (the reference's no-grad forward,
    scene_dataset.py:666-686)."""

    @jax.jit
    def forward(variables, clouds):
        out = model.apply(variables, clouds, train=False)
        return _global_desc(out)

    return forward


def build_local_forward_fn(model, cfg: Dict[str, Any]) -> Optional[Callable]:
    """Jitted ``(variables, (B, N, 3)) -> (global (B, D), local (B, K, C),
    center_idx (B, K))`` for models that expose local descriptors — the
    reference's tuple-returning forward consumed by the local-descriptor
    store (scene_dataset.py:676-679, 687-708): local = the second-to-last
    feature-propagation level, centres = level-1 indices mapped to the
    original cloud. Returns None for models without locals
    (pointnet_vlad, minkloc3dv2)."""
    if not _has_local_fields(model):
        return None

    def forward(variables, clouds):
        out = model.apply(variables, clouds, train=False)
        return (
            _global_desc(out),
            out.fp_features[-2],
            out.center_idx_origin[0],
        )

    return jax.jit(forward)


def _has_local_fields(model) -> bool:
    """PatchAugNet / PPT-Net outputs carry fp_features + center_idx_origin."""
    return type(model).__name__ in ("PatchAugNet", "PPTNet")


def build_center_fn(npoint: int) -> Callable:
    """Jitted level-0 centre extraction for host-side correspondence
    building: identical deterministic FPS to the model's first SA level,
    so host tables always match the forward's patch slots."""

    @jax.jit
    def centers(clouds):
        return farthest_point_sample(clouds, npoint)

    return centers


def empty_patch_inputs(cfg: Dict[str, Any], total_clouds: int):
    """Zero correspondence tables + all-false mask (non-patch batches)."""
    corr = PatchCorrespondences.empty(
        cfg.get("A2B_MAX_ROWS", 2048), cfg.get("A2B_MAX_PAIRS", 16)
    )
    return corr, jnp.zeros((total_clouds,), bool)
