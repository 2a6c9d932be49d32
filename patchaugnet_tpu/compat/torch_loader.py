"""Load reference torch checkpoints into flax variable trees.

The reference saves ``{'epoch', 'iter', 'optimizer', 'state_dict_encoder'}``
per epoch (train_place_recognition.py:172-189) and its eval loader also
accepts bare state dicts (evaluate.py:150-158). This module maps those
state-dict names onto this framework's parameter tree so users can bring
trained reference weights across.

Status: full name-mapping tables land with the parity work; the loader
currently raises with a clear message for unmapped model types.
"""
from __future__ import annotations

from typing import Any, Dict


def load_torch_checkpoint(
    path: str, model_type: str, cfg: Dict[str, Any], template_variables
):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = obj.get("state_dict_encoder", obj) if isinstance(obj, dict) else obj
    raise NotImplementedError(
        f"torch checkpoint import for model_type={model_type} is not wired "
        f"up yet (found {len(state_dict)} tensors in {path}); use an orbax "
        f"checkpoint trained with this framework, or open the mapping table "
        f"in patchaugnet_tpu/compat/torch_loader.py"
    )
