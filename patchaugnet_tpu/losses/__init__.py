"""Loss registry mirroring the reference's string dispatch
(train_place_recognition.py:102-120)."""
from .metric import (
    best_pos_distance,
    triplet_loss,
    triplet_loss_wrapper,
    quadruplet_loss,
    hphn_quadruplet_loss,
)
from .recon import (
    chamfer_loss,
    chamfer_l1_masked,
    emd_loss,
    point_pair_loss,
    patch_chamfer_loss,
    patch_emd_loss,
)
from .patch_contrast import (
    PatchCorrespondences,
    patch_contrastive_loss,
    contrastive_loss,
)
from .miners import (
    batch_hard_triplet_loss,
    batch_hard_contrastive_loss,
    contrastive_quadruplet_loss,
    ot_loss,
    pps_loss,
)
from .extra import (
    truncated_smooth_ap,
    multi_similarity_loss,
    binary_focal_loss,
    focal_loss,
    cosine_affinity,
)


def get_loss_func(loss_type: str):
    """String-keyed dispatch (reference get_loss_func)."""
    table = {
        "quadruplet": quadruplet_loss,
        "hphn_quadruplet": hphn_quadruplet_loss,
        "contrastive": contrastive_loss,
        "chamfer": chamfer_loss,
        "patch_chamfer": patch_chamfer_loss,
        "emd": emd_loss,
        "patch_emd": patch_emd_loss,
        "point_pair": point_pair_loss,
    }
    return table.get(loss_type, triplet_loss_wrapper)


__all__ = [
    "best_pos_distance",
    "triplet_loss",
    "triplet_loss_wrapper",
    "quadruplet_loss",
    "hphn_quadruplet_loss",
    "chamfer_loss",
    "chamfer_l1_masked",
    "emd_loss",
    "point_pair_loss",
    "patch_chamfer_loss",
    "patch_emd_loss",
    "PatchCorrespondences",
    "patch_contrastive_loss",
    "contrastive_loss",
    "truncated_smooth_ap",
    "multi_similarity_loss",
    "binary_focal_loss",
    "focal_loss",
    "cosine_affinity",
    "batch_hard_triplet_loss",
    "batch_hard_contrastive_loss",
    "contrastive_quadruplet_loss",
    "ot_loss",
    "pps_loss",
    "get_loss_func",
]
