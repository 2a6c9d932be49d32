"""Verify drive: composed ops pipeline through the public export with
the gather OOB-canary change (PCR_DEBUG), production path untouched.

Run from /root/repo (no PYTHONPATH).
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from patchaugnet_tpu import ops

rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
feats = jnp.asarray(rng.rand(2, 256, 8).astype(np.float32))


def pipeline(xyz, feats):
    idx = ops.farthest_point_sample(xyz, 64)
    new_xyz = ops.gather(xyz, idx)
    center = ops.gather(feats, idx)
    g = ops.query_and_group_edge(
        xyz, new_xyz, feats, center, nsample=8
    )
    pooled = jnp.max(g.new_features, axis=2)
    up = ops.interpolate_features(xyz, new_xyz, pooled)
    return up


jbase = np.asarray(jax.jit(pipeline)(xyz, feats))
assert jbase.shape == (2, 256, 11) and np.isfinite(jbase).all()
base = np.asarray(pipeline(xyz, feats))  # eager, PCR_DEBUG unset

os.environ["PCR_DEBUG"] = "1"
dbg = np.asarray(pipeline(xyz, feats))  # eager so env is re-read
assert np.array_equal(base, dbg), "in-range canary path must be bit-identical"

# poison check through the public export
bad_idx = jnp.asarray(np.array([[0, 300], [5, -1]], np.int32))
out = np.asarray(ops.gather(feats, bad_idx))
assert np.isnan(out[0, 1]).all() and np.isnan(out[1, 1]).all()
assert np.isfinite(out[0, 0]).all() and np.isfinite(out[1, 0]).all()
del os.environ["PCR_DEBUG"]
out2 = np.asarray(ops.gather(feats, bad_idx))
assert np.isfinite(out2).all()
print("VERIFY gather canary: OK (pipeline bit-identical, poison works)")
