"""Probe: point-sharded PPT-Net TRAIN forward vs single device."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from patchaugnet_tpu.models import PPTNet
from patchaugnet_tpu.parallel.sharded_train import sharded_pptnet_train_forward
from patchaugnet_tpu.train.step import _split_tuple, make_loss_fn
from patchaugnet_tpu import losses as L

CFG = {
    "model_type": "pptnet",
    "AGGREGATION": "spvlad",
    "GROUP": 8,
    "NUM_POINTS": 256,
    "FEATURE_OUTPUT_DIM": 256,
    "FEATURE_SIZE": [256, 256, 256, 256],
    "MAX_SAMPLES": [16, 32, 64, 256],
    "CLUSTER_SIZE": [1, 4, 16, 64],
    "OUTPUT_DIM": [256, 256, 256, 256],
    "GATING": True,
    "SAMPLING": [64, 32, 16, 8],
    "KNN": [10, 10, 8, 8],
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

rng = np.random.RandomState(7)
bs, np_, nn_ = 2, 1, 2
total = bs * (1 + np_ + nn_ + 1)
clouds = jnp.asarray(rng.rand(total, 256, 3).astype(np.float32))
model = PPTNet(param=CFG, use_normalize=False)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), clouds, train=False
)
params, bstats = variables["params"], variables["batch_stats"]

ref_loss_fn = make_loss_fn(model, CFG)
(ref_loss, (_, ref_bs)), ref_grads = jax.value_and_grad(
    ref_loss_fn, has_aux=True
)(params, bstats, clouds, None, None)

mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "points"))
pr_loss = L.get_loss_func("quadruplet")


def sh_loss_fn(p, b, c):
    desc, new_bs = sharded_pptnet_train_forward(
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
rel = abs(float(sh_loss) - float(ref_loss)) / max(abs(float(ref_loss)), 1e-12)
assert rel <= 2e-4, rel

for (pth, a), (_, b) in zip(
    jax.tree_util.tree_flatten_with_path(sh_bs)[0],
    jax.tree_util.tree_flatten_with_path(ref_bs)[0],
):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
        err_msg=jax.tree_util.keystr(pth),
    )
print("batch stats match (1e-4/1e-5)")

g_ref = jax.tree_util.tree_leaves(ref_grads)
gmax = max(float(np.linalg.norm(np.asarray(g))) for g in g_ref)
worst = 0.0
for (pth, a), (_, b) in zip(
    jax.tree_util.tree_flatten_with_path(sh_grads)[0],
    jax.tree_util.tree_flatten_with_path(ref_grads)[0],
):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.linalg.norm(b), 1e-4 * gmax)
    err = np.linalg.norm(a - b) / scale
    worst = max(worst, err)
    assert err < 5e-2, f"{jax.tree_util.keystr(pth)}: rel-L2 {err:.3e}"
print(f"grads under structural bound (worst leaf rel-L2 {worst:.3e})")
print("OK")
