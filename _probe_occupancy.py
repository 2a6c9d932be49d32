#!/usr/bin/env python
"""Per-level sparse-pyramid occupancy on different cloud geometries.

VERDICT r4 next #2: every pyramid level keeps the full V=4096 table
capacity while stride-2 levels merge voxels — nobody had measured how
many voxels are actually occupied per level on realistic clouds. This
probe builds the MinkLocSparse pyramid (reference config: cartesian
0.01, 4 levels) over several cloud geometries and prints occupied
counts per level (mean / max over the batch).

Geometries:
  uniform : bench_models.py's distribution — uniform in [-1, 1]^3.
            Volumetric, worst case for merging (voxels only collide
            once (2^s * 0.01)^3 * density ~ 1).
  scene   : LiDAR-submap-like surfaces — ground plane + building
            facades + poles, sampled then unit-sphere normalized like
            the data pipeline (data/pointclouds.py::normalize_point_
            cloud). Surface point spacing ~0.03 means stride-2 levels
            merge quadratically. This is the geometry the reference's
            Oxford/in-house benchmarks actually have.
  sphere  : points on the unit-sphere surface (pure-surface control).

Run: python _probe_occupancy.py  (CPU, seconds)
"""
import json

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from patchaugnet_tpu.models.minkloc_sparse import (
    build_table,
    downsample_table,
    quantize_cartesian,
)

B, N = 32, 4096
NUM_LEVELS = 4
STEP = 0.01


def clouds_uniform(rng):
    return rng.rand(B, N, 3).astype(np.float32) * 2 - 1


def clouds_sphere(rng):
    v = rng.randn(B, N, 3).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def clouds_scene(rng):
    """Ground + facades + poles, ~25 m extent, unit-sphere normalized
    (the package generator — data/pointclouds.py)."""
    from patchaugnet_tpu.data.pointclouds import synthetic_scene_clouds

    return synthetic_scene_clouds(rng, B, N)


def occupancy(clouds):
    coords, valid, dims = quantize_cartesian(jnp.asarray(clouds), STEP)
    table = build_table(coords, valid, dims)
    counts = [np.asarray(table.mask.sum(axis=1))]
    d = dims
    for _ in range(NUM_LEVELS):
        table, d = downsample_table(table, d)
        counts.append(np.asarray(table.mask.sum(axis=1)))
    return counts


def main():
    rng = np.random.RandomState(0)
    gens = {
        "uniform": clouds_uniform,
        "scene": clouds_scene,
        "sphere": clouds_sphere,
    }
    for name, gen in gens.items():
        counts = occupancy(gen(rng))
        rec = {
            "geometry": name,
            "capacity": N,
            "levels": [
                {
                    "level": i,
                    "mean": round(float(c.mean()), 1),
                    "max": int(c.max()),
                    "frac_of_capacity": round(float(c.max()) / N, 3),
                }
                for i, c in enumerate(counts)
            ],
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
