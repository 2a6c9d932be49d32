"""Probe: full point-sharded PatchAugNet forward vs single device."""
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
from patchaugnet_tpu.parallel.sharded_model import sharded_patchaugnet_descriptor

CFG = {
    "FEATURE_SIZE": [256, 256, 256],
    "MAX_SAMPLES": [8, 32, 128],
    "CLUSTER_SIZE": [4, 16, 64],
    "OUTPUT_DIM": [256, 256, 256],
    "USE_ORIGIN_PC_IN_FP": True,
    "GATING": False,
    "AGGREGATION_TYPE": 2,
    "SAMPLING": [32, 8, 4],
    "KNN": [8, 8, 4],
    "KNN_DILATION": 2,
}

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
model = PatchAugNet(param=CFG, use_a2a_recon=False)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), x, train=False
)
ref = model.apply(variables, x, train=False)

for meshspec in [("points4", None), ("dp_sp", "data")]:
    if meshspec[0] == "points4":
        mesh = Mesh(np.array(jax.devices()[:4]), ("points",))
    else:
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "points"))
    desc, fps_ = sharded_patchaugnet_descriptor(
        variables, CFG, x, mesh, axis_name="points", batch_axis=meshspec[1]
    )
    d = np.asarray(desc)
    r = np.asarray(ref.global_desc)
    print(meshspec[0], "desc max abs diff:", np.abs(d - r).max())
    for i, (a, b) in enumerate(zip(fps_, ref.fp_features)):
        print(
            f"  fp{i} max abs diff:",
            np.abs(np.asarray(a) - np.asarray(b)).max(),
            "bit-equal:" ,
            np.asarray(a).tobytes() == np.asarray(b).tobytes(),
        )

# large-N: n=1024 on the 8-way points mesh vs single device
mesh8 = Mesh(np.array(jax.devices()[:8]), ("points",))
xl = jnp.asarray(rng.rand(1, 1024, 3).astype(np.float32))
ref_l = model.apply(variables, xl, train=False)
desc_l, _ = sharded_patchaugnet_descriptor(variables, CFG, xl, mesh8)
print(
    "large-N desc max abs diff:",
    np.abs(np.asarray(desc_l) - np.asarray(ref_l.global_desc)).max(),
)
print("OK")
