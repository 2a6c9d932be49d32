#!/usr/bin/env python
"""Real-chip vs CPU diff for the sparse MinkLoc conv trunk.

Usage: python _verify_sparse_tpu.py {tpu|cpu}

Runs one deterministic MinkLoc3Dv2 (sparse voxel-table backend) forward
at the serving shape and saves the descriptors to
/tmp/sparse_<platform>.npy so the battery can diff them.  This is the
real-hardware counterpart of the CPU oracle suite
(tests/test_minkloc_sparse.py): the CPU backend preserves behaviours
the TPU does not (e.g. denormals — see CLAUDE.md's
int-through-float note), so any new routing machinery must be diffed on
the actual chip before the CPU suite is trusted.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")

    import numpy as np
    import jax.numpy as jnp
    import yaml

    from patchaugnet_tpu.models import get_model
    from patchaugnet_tpu.train.step import _global_desc

    cfg = yaml.safe_load(open("configs/minkloc3dv2.yaml"))
    cfg["model_type"] = "minkloc3dv2"
    model = get_model("minkloc3dv2", cfg)
    rng = jax.random.PRNGKey(0)
    # Deterministic host-side input so both platforms see identical bytes.
    x = jnp.asarray(
        np.random.default_rng(42).uniform(-1, 1, (8, 4096, 3)).astype(np.float32)
    )
    variables = jax.jit(model.init)(rng, x)
    fwd = jax.jit(lambda v, c: _global_desc(model.apply(v, c, train=False)))
    out = np.asarray(fwd(variables, x))
    assert np.isfinite(out).all()
    np.save(f"/tmp/sparse_{platform}.npy", out)
    print(f"saved /tmp/sparse_{platform}.npy", out.shape, platform,
          jax.devices()[0].platform)


if __name__ == "__main__":
    main()
