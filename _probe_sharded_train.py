"""Probe: per-leaf grad comparison, point-sharded train vs single device."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from patchaugnet_tpu.models import PatchAugNet
from patchaugnet_tpu.parallel.sharded_train import sharded_patchaugnet_train_forward
from patchaugnet_tpu.train.step import _split_tuple, make_loss_fn
from patchaugnet_tpu import losses as L

CFG = {
    "model_type": "patch_aug_net",
    "use_patch_recon": False,
    "use_patch_feature_contrast": False,
    "AGGREGATION_TYPE": 2,
    "NUM_POINTS": 128,
    "FEATURE_SIZE": [256, 256, 256],
    "MAX_SAMPLES": [8, 32, 128],
    "CLUSTER_SIZE": [4, 16, 64],
    "OUTPUT_DIM": [256, 256, 256],
    "USE_ORIGIN_PC_IN_FP": True,
    "GATING": False,
    "SAMPLING": [32, 8, 4],
    "KNN": [8, 8, 4],
    "KNN_DILATION": 2,
    "TRAIN_BATCH_SIZE": 2,
    "TRAIN_POSITIVES_PER_QUERY": 1,
    "TRAIN_NEGATIVES_PER_QUERY": 2,
    "MARGIN_1": 0.5,
    "MARGIN_2": 0.2,
    "LOSS_FUNCTION": "quadruplet",
    "LOSS_LAZY": False,
    "TRIPLET_USE_BEST_POSITIVES": False,
    "LOSS_IGNORE_ZERO_BATCH": False,
}

rng = np.random.RandomState(42)
bs, np_, nn_ = 2, 1, 2
total = bs * (1 + np_ + nn_ + 1)
clouds = jnp.asarray(rng.rand(total, 128, 3).astype(np.float32))
model = PatchAugNet(param=CFG, use_a2a_recon=False)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), clouds, train=False
)
params, bstats = variables["params"], variables["batch_stats"]

ref_loss_fn = make_loss_fn(model, CFG)
(ref_loss, (_, ref_bs)), ref_grads = jax.value_and_grad(ref_loss_fn, has_aux=True)(
    params, bstats, clouds, None, None
)

mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "points"))
pr_loss = L.get_loss_func("quadruplet")


def sh_loss_fn(p, b, c):
    desc, new_bs = sharded_patchaugnet_train_forward(
        p, b, CFG, c, mesh, axis_name="points", batch_axis="data"
    )
    q, pos, neg, other = _split_tuple(desc, bs, np_, nn_)
    return (
        pr_loss(q, pos, neg, other, 0.5, 0.2, use_min=False, lazy=False,
                ignore_zero_loss=False),
        new_bs,
    )


(sh_loss, sh_bs), sh_grads = jax.value_and_grad(sh_loss_fn, has_aux=True)(
    params, bstats, clouds
)
print(f"loss: ref {float(ref_loss):.6f}  sharded {float(sh_loss):.6f}")

flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
flat_sh = jax.tree_util.tree_flatten_with_path(sh_grads)[0]
worst = []
for (path_r, a), (path_s, b) in zip(flat_sh, flat_ref):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    nb, nd = np.linalg.norm(b), np.linalg.norm(a - b)
    rel = nd / (nb + 1e-12)
    worst.append((rel, nd, nb, jax.tree_util.keystr(path_r)))
worst.sort(reverse=True)
gmax = max(w[2] for w in worst)
print(f"global max leaf norm: {gmax:.3e}")
for rel, nd, nb, name in worst[:12]:
    print(f"  rel {rel:.3e}  |d| {nd:.3e}  |g| {nb:.3e}  {name}")
