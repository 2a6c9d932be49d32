"""Probe: full point-sharded PointNetVLAD forward vs single device.

Drives parallel.sharded_model.sharded_pointnetvlad_descriptor on the
8-device virtual CPU mesh at the REFERENCE geometry (4096-pt clouds)
and at 4x that (16384 pts, same variables) — the no-cap scaling story
for the third model family.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from patchaugnet_tpu.models import PointNetVLAD
from patchaugnet_tpu.parallel.sharded_model import sharded_pointnetvlad_descriptor

PARAM = {"NUM_POINTS": 4096, "FEATURE_OUTPUT_DIM": 256}

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(2, 4096, 3).astype(np.float32))
model = PointNetVLAD(num_points=4096, output_dim=256)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), x, train=False
)
ref = np.asarray(model.apply(variables, x, train=False))

mesh = Mesh(np.array(jax.devices()[:8]), ("points",))
desc = np.asarray(
    sharded_pointnetvlad_descriptor(variables, PARAM, x, mesh, axis_name="points")
)
d = float(np.max(np.abs(desc - ref)))
print(f"points-8 mesh, n=4096: max |sharded - single| = {d:.3e}")
assert d < 1e-5, d
assert np.isfinite(desc).all()

# dp x sp 2D mesh
mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "points"))
desc2 = np.asarray(
    sharded_pointnetvlad_descriptor(
        variables, PARAM, x, mesh2, axis_name="points", batch_axis="data"
    )
)
d2 = float(np.max(np.abs(desc2 - ref)))
print(f"dp x sp (2 x 4) mesh, n=4096: max diff = {d2:.3e}")
assert d2 < 1e-5, d2

# 4x the configured NUM_POINTS through the same variables (no cap)
xb = jnp.asarray(rng.rand(1, 16384, 3).astype(np.float32))
ref_b = np.asarray(model.apply(variables, xb, train=False))
desc_b = np.asarray(
    sharded_pointnetvlad_descriptor(variables, PARAM, xb, mesh, axis_name="points")
)
db = float(np.max(np.abs(desc_b - ref_b)))
print(f"points-8 mesh, n=16384 (4x config): max diff = {db:.3e}")
assert db < 1e-5, db
print("OK")
