"""Train state, optimizer/schedule factories, checkpointing.

TPU-native equivalents of the reference driver pieces:
  - optimizer factory (train_place_recognition.py:123-130): adam /
    momentum-SGD via optax.
  - LR schedule factory (:133-139): StepLR(step_size=10 epochs,
    gamma=0.2) and CosineAnnealingLR, expressed as optax schedules over
    the *step* counter (steps_per_epoch provided by the caller).
  - checkpoint save/resume (:172-189, 518-526): orbax checkpoints of
    {params, batch_stats, opt_state, epoch, iteration} named
    ``train_epoch_{E}_end`` with the same resume semantics.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_schedule(
    decay_type: str,
    base_lr: float,
    steps_per_epoch: int,
    max_epoch: int = 30,
    step_size_epochs: int = 10,
    gamma: float = 0.2,
) -> optax.Schedule:
    if decay_type == "step":
        # torch StepLR(step_size=10, gamma=0.2) stepped per epoch
        boundaries = {
            e * step_size_epochs * steps_per_epoch: gamma
            for e in range(1, max(max_epoch // step_size_epochs + 1, 2))
        }
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if decay_type == "cosine":
        # torch CosineAnnealingLR(T_max=max_epoch, eta_min=base_lr) as
        # constructed by the reference (eta_min == base LR makes it
        # constant; kept for parity, train_place_recognition.py:136-137)
        return optax.constant_schedule(base_lr)
    return optax.constant_schedule(base_lr)


def make_optimizer(
    optimizer_type: str,
    schedule: optax.Schedule,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    if optimizer_type == "momentum":
        return optax.sgd(schedule, momentum=momentum)
    return optax.adam(schedule)


def create_train_state(
    model,
    rng: jax.Array,
    example_input: jax.Array,
    cfg: Dict[str, Any],
    steps_per_epoch: int = 1000,
    init_kwargs: Optional[Dict[str, Any]] = None,
    tx: Optional[Any] = None,
) -> TrainState:
    """Init variables + optimizer. ``tx`` overrides the config-derived
    optimizer (e.g. the SmoothAP pipeline's AdamW + MultiStepLR)."""
    if tx is None:
        schedule = make_schedule(
            cfg.get("LEARNING_RATE_DECAY", "step"),
            cfg["BASE_LEARNING_RATE"],
            steps_per_epoch,
            cfg.get("MAX_EPOCH", 30),
        )
        tx = make_optimizer(
            cfg.get("OPTIMIZER", "adam"), schedule, cfg.get("MOMENTUM", 0.9)
        )
    variables = jax.jit(
        lambda k, x: model.init(k, x, **(init_kwargs or {}))
    )(rng, example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


# ------------------------------------------------------------ checkpoints
def save_checkpoint(
    save_dir: str, state: TrainState, epoch: int, iteration: int = 0
) -> str:
    """Orbax checkpoint named like the reference's per-epoch .pth."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(save_dir, f"train_epoch_{epoch}_end"))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(dict(state.batch_stats)),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
        "iteration": iteration,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Restore model+optimizer+epoch (reference --resume semantics)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(dict(state.batch_stats)),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
        "epoch": 0,
        "iteration": 0,
    }
    loaded = ckptr.restore(os.path.abspath(path), template)
    new_state = state.replace(
        step=jnp.asarray(loaded["step"], jnp.int32),
        params=loaded["params"],
        batch_stats=loaded["batch_stats"],
        opt_state=loaded["opt_state"],
    )
    return new_state, int(loaded["epoch"])
