"""Training layer: state, jitted steps, epoch loops, checkpointing."""
from .state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_schedule,
    save_checkpoint,
    restore_checkpoint,
)
from .step import (
    build_train_step,
    build_forward_fn,
    build_local_forward_fn,
    build_center_fn,
    empty_patch_inputs,
)
from .loop import train_one_epoch, evaluate, prepare_patch_inputs
from .smoothap import (
    sample_smoothap_batch,
    build_masks,
    build_smoothap_train_step,
    multistep_schedule,
    train_one_epoch_smoothap,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_schedule",
    "save_checkpoint",
    "restore_checkpoint",
    "build_train_step",
    "build_forward_fn",
    "build_local_forward_fn",
    "build_center_fn",
    "empty_patch_inputs",
    "train_one_epoch",
    "evaluate",
    "prepare_patch_inputs",
    "sample_smoothap_batch",
    "build_masks",
    "build_smoothap_train_step",
    "multistep_schedule",
    "train_one_epoch_smoothap",
]
