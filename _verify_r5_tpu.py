#!/usr/bin/env python
"""Round-5 on-chip verification drives.

1. Dense-branch COMPUTE_DTYPE (new this round — MinkLocDense previously
   ignored it silently): bf16 forward on the real chip must be finite
   and cosine-close to the f32 forward under the SAME params.
2. Sparse pyramid capacities: the capped forward must match the
   uncapped forward on-chip when the capacities hold (the CPU suite
   asserts this at 1-2 ulp; here we check max-abs on real hardware at
   the bench geometry).

Run: ``timeout 1200 python -u _verify_r5_tpu.py``
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_models import _backend_watchdog  # noqa: E402

_backend_watchdog()

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "float32")
import jax.numpy as jnp
import yaml

from patchaugnet_tpu.models import get_model
from patchaugnet_tpu.data.pointclouds import synthetic_scene_clouds


def dense_bf16():
    cfg = dict(
        yaml.safe_load(open("configs/minkloc3dv2.yaml")),
        model_type="minkloc3dv2", grid_size=32,  # grid_size -> dense branch
    )
    x = jnp.asarray(
        synthetic_scene_clouds(np.random.RandomState(0), 8, 4096)
    )
    m32 = get_model("minkloc3dv2", cfg)
    v = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
    o32 = np.asarray(jax.jit(lambda v, c: m32.apply(v, c, train=False))(v, x))
    mb = get_model("minkloc3dv2", dict(cfg, COMPUTE_DTYPE="bfloat16"))
    ob = np.asarray(jax.jit(lambda v, c: mb.apply(v, c, train=False))(v, x))
    assert np.isfinite(ob).all(), "dense bf16 descriptor not finite"
    cos = float(
        (o32 * ob).sum()
        / (np.linalg.norm(o32) * np.linalg.norm(ob) + 1e-12)
    )
    changed = float(np.abs(o32 - ob).max())
    print(f"dense bf16: finite=True cosine={cos:.6f} "
          f"maxdiff_vs_f32={changed:.3e} (0.0 would mean the dtype is "
          f"still ignored)", flush=True)
    assert cos > 0.995 and changed > 0.0


def sparse_capped_equality():
    from patchaugnet_tpu.models.minkloc_sparse import (
        measure_level_occupancy,
        suggest_level_capacities,
    )

    cfg = dict(
        yaml.safe_load(open("configs/minkloc3dv2.yaml")),
        model_type="minkloc3dv2",
    )
    x = jnp.asarray(
        synthetic_scene_clouds(np.random.RandomState(1), 8, 4096)
    )
    counts = measure_level_occupancy(
        x, num_levels=len(cfg.get("layers", (1, 1, 1, 1))),
        coordinates=cfg.get("coordinates", "cartesian"),
        quantization_step=cfg.get("quantization_step", 0.01),
    )
    caps = suggest_level_capacities(counts, margin=1.25, align=256, full=4096)
    full = get_model("minkloc3dv2", cfg)
    v = jax.jit(full.init)(jax.random.PRNGKey(0), x)
    of = np.asarray(jax.jit(lambda v, c: full.apply(v, c, train=False))(v, x))
    capped = get_model("minkloc3dv2", dict(cfg, level_capacity=caps))
    oc = np.asarray(
        jax.jit(lambda v, c: capped.apply(v, c, train=False))(v, x)
    )
    diff = float(np.abs(of - oc).max())
    print(f"sparse capped caps={caps}: maxdiff_vs_full={diff:.3e}", flush=True)
    assert diff < 1e-5, diff


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    dense_bf16()
    sparse_capped_equality()
    print(f"all r5 TPU drives passed ({time.perf_counter()-t0:.0f}s)",
          flush=True)
