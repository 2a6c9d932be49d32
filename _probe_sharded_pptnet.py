"""Probe: full point-sharded PPT-Net forward vs single device."""
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
from patchaugnet_tpu.parallel.sharded_model import sharded_pptnet_descriptor

CFG = {
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
}

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
model = PPTNet(param=CFG, use_normalize=True)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), x, train=False
)
ref = model.apply(variables, x, train=False)

for kind, batch_axis in [("points4", None), ("dp_sp", "data")]:
    if kind == "points4":
        mesh = Mesh(np.array(jax.devices()[:4]), ("points",))
    else:
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "points"))
    desc, fps_ = sharded_pptnet_descriptor(
        variables, CFG, x, mesh, axis_name="points", batch_axis=batch_axis
    )
    print(
        kind,
        "desc max abs diff:",
        np.abs(np.asarray(desc) - np.asarray(ref.global_desc)).max(),
    )
    for i, (a, b) in enumerate(zip(fps_, ref.fp_features)):
        print(
            f"  fp[{i}] max:",
            np.abs(np.asarray(a) - np.asarray(b)).max(),
            "bit-equal:",
            np.asarray(a).tobytes() == np.asarray(b).tobytes(),
        )
print("OK")
