"""patchaugnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) point-cloud place-recognition framework.

A from-scratch rebuild of the capabilities of WHU-USI3DV/PatchAugNet
(reference mounted read-only at /root/reference) designed TPU-first:

- ``ops``      fixed-shape point ops (FPS, kNN, grouping, 3-NN interpolation,
               chamfer, auction EMD) as pure-JAX/Pallas programs replacing the
               reference's four CUDA extension libraries (``libs/pointops``,
               ``libs/chamfer_dist``, ``libs/emd_module``, ``libs/KNN_CUDA``).
- ``nn``       flax building blocks (SharedMLP, NetVLAD/SPVLAD, attention,
               gating, STN, PointNet decoder).
- ``models``   PointNetVLAD, PPT-Net, PatchAugNet, MinkLoc3Dv2(dense-voxel).
- ``losses``   quadruplet/triplet/hphn/contrastive metric losses and
               chamfer/EMD reconstruction losses, all jittable.
- ``data``     dataset registry, scene dataset, tuple sampling, augmentation,
               on-TPU retrieval/recall engine.
- ``parallel`` jax.sharding.Mesh data/model-parallel layer (pjit train step,
               sharded descriptor extraction).
- ``train``    optax train state, schedules, train/eval loops.
"""

__version__ = "0.1.0"
