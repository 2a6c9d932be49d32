"""Model zoo + factory.

Mirrors the reference's string-keyed model dispatch
(train_place_recognition.py:73-89, evaluate.py:88-147).
"""
from typing import Any, Dict

from .pointnet_vlad import PointNetVLAD, PointNetFeat
from .pptnet import PPTNet, PPTNetOutput
from .patch_aug_net import PatchAugNet, PatchAugNetOutput, PatchData


def get_model(model_type: str, param: Dict[str, Any]):
    """Build a flax model by reference model_type string."""
    if model_type == "pptnet":
        return PPTNet(param=param, use_normalize=False)
    if model_type == "pptnet_l2_norm":
        return PPTNet(param=param, use_normalize=True)
    if model_type == "pointnet_vlad":
        cdt = param.get("COMPUTE_DTYPE")
        return PointNetVLAD(
            num_points=param["NUM_POINTS"],
            output_dim=param["FEATURE_OUTPUT_DIM"],
            compute_dtype=None if cdt is None else cdt,
        )
    if model_type == "patch_aug_net":
        return PatchAugNet(
            param=param,
            use_a2a_recon=param.get("use_patch_recon", True),
            use_l2_norm=True,
        )
    if model_type == "minkloc3dv2":
        from .minkloc3dv2 import build_minkloc

        return build_minkloc(param)
    raise ValueError(f"unknown model_type: {model_type}")


__all__ = [
    "get_model",
    "PointNetVLAD",
    "PointNetFeat",
    "PPTNet",
    "PPTNetOutput",
    "PatchAugNet",
    "PatchAugNetOutput",
    "PatchData",
]
