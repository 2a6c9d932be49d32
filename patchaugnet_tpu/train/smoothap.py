"""TruncatedSmoothAP training pipeline (MinkLoc3Dv2 branch).

The reference trains MinkLoc3Dv2 with flat batches of single clouds and
(B, B) positives/negatives masks fed to ``TruncatedSmoothAP``
(Minkloc3D_V2/models/losses/loss.py + losses/truncated_smoothap.py),
batches built from pair-expanded sampling (each anchor enters with one
of its positives). TPU version: one jitted step per batch — embed all
clouds, compute the masked AP surrogate, AdamW (weight_decay from the
INI TrainingParams), MultiStepLR as an optax schedule.
"""
from __future__ import annotations

import random
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.scene_dataset import SceneDataset
from ..losses import truncated_smooth_ap
from .state import TrainState


def sample_smoothap_batch(
    scene: SceneDataset,
    batch_size: int,
    rng: Optional[random.Random] = None,
) -> Optional[List[int]]:
    """Pair-expanded batch: anchors with >=1 positive, each followed by
    one sampled positive (the MinkLoc BatchSampler pattern)."""
    rng = rng or random
    skip = scene.data_cfg["skip_trip_itself"]
    candidates = [
        i
        for i in range(len(scene.records))
        if scene.get_tuple(i, -1, skip).positive_indices
    ]
    if len(candidates) < batch_size // 2:
        return None
    anchors = rng.sample(candidates, batch_size // 2)
    batch: List[int] = []
    for a in anchors:
        batch.append(a)
        batch.append(rng.choice(scene.get_tuple(a, -1, skip).positive_indices))
    return batch[:batch_size]


def build_masks(
    scene: SceneDataset, batch_indices: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray]:
    """(B, B) positives/negatives masks from the scene's tuples.

    Elements that are neither positive nor negative (the "unknown" ring
    between the two radii) are masked out of both, like the reference
    mask construction.
    """
    b = len(batch_indices)
    skip = scene.data_cfg["skip_trip_itself"]
    pos = np.zeros((b, b), bool)
    neg = np.zeros((b, b), bool)
    for i, qi in enumerate(batch_indices):
        t = scene.get_tuple(qi, -1, skip)
        pset, nset = set(t.positive_indices), set(t.negative_indices)
        for j, rj in enumerate(batch_indices):
            if i == j:
                continue
            if rj in pset:
                pos[i, j] = True
            elif rj in nset:
                neg[i, j] = True
    return pos, neg


def build_smoothap_train_step(
    model,
    lr_schedule: optax.Schedule,
    weight_decay: Optional[float] = None,
    tau1: float = 0.01,
    positives_per_query: int = 4,
) -> Tuple[Callable, optax.GradientTransformation]:
    """Returns ``(step(state, clouds, pos_mask, neg_mask) ->
    (state, stats), tx)``."""
    tx = (
        optax.adamw(lr_schedule, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(lr_schedule)
    )

    def loss_fn(params, batch_stats, clouds, pos_mask, neg_mask):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            clouds,
            train=True,
            mutable=["batch_stats"],
        )
        emb = out if isinstance(out, jax.Array) else out.global_desc
        loss, stats = truncated_smooth_ap(
            emb, pos_mask, neg_mask, tau1=tau1,
            positives_per_query=positives_per_query,
        )
        return loss, (stats, mutated["batch_stats"])

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, clouds, pos_mask, neg_mask):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (stats, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, clouds, pos_mask, neg_mask
        )
        return state.apply_gradients(grads, new_bs), stats

    return step, tx


def train_one_epoch_smoothap(
    state: TrainState,
    step: Callable,
    scene: SceneDataset,
    batch_size: int,
    batches_per_epoch: int,
    rng: Optional[random.Random] = None,
    get_clouds: Optional[Callable] = None,
    logger=None,
) -> Tuple[TrainState, Dict[str, float]]:
    """One SmoothAP epoch: sample pair-expanded batches, build masks,
    run the jitted step (the MinkLoc trainer loop)."""
    rng = rng or random.Random(0)
    get_clouds = get_clouds or (lambda idx: scene.get_clouds(idx)[0])
    agg: Dict[str, list] = {}
    for _ in range(batches_per_epoch):
        batch_idx = sample_smoothap_batch(scene, batch_size, rng)
        if batch_idx is None:
            continue
        pos, neg = build_masks(scene, batch_idx)
        clouds = jnp.asarray(get_clouds(batch_idx))
        state, stats = step(state, clouds, jnp.asarray(pos), jnp.asarray(neg))
        for k in ("loss", "ap"):
            agg.setdefault(k, []).append(float(stats[k]))
    summary = {k: float(np.mean(v)) for k, v in agg.items() if v}
    if logger and summary:
        logger.info(f"smoothap epoch: {summary}")
    return state, summary


def multistep_schedule(
    lr: float, milestones: Sequence[int], steps_per_epoch: int, gamma: float = 0.1
) -> optax.Schedule:
    """torch MultiStepLR as an optax piecewise-constant schedule."""
    return optax.piecewise_constant_schedule(
        lr, {int(m) * steps_per_epoch: gamma for m in milestones}
    )
