#!/usr/bin/env python
"""Per-model-family forward throughput (the BASELINE.md per-model table,
reproducible in one command).

Measures descriptor extraction for all four families at the reference
serving shape (B=32, 4096-pt clouds, f32 matmul precision) with the
same enqueue-K-fetch-last timing protocol as bench.py (the axon
tunnel's ``block_until_ready`` returns at enqueue). Prints one JSON
line per model.

Usage: python bench_models.py [--models patch_aug_net pptnet ...]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 32
N_POINTS = 4096
ITERS = 15
WARMUP = 2

MODEL_CFGS = {
    "patch_aug_net": "configs/patch_aug_net.yaml",
    "pptnet": "configs/pptnet_origin.yaml",
    "pointnet_vlad": "configs/pointnet_vlad.yaml",
    "minkloc3dv2": "configs/minkloc3dv2.yaml",
}


def _backend_watchdog(timeout_s: float = 600.0):
    """Fail fast if TPU backend init hangs (see bench.py's watchdog:
    the axon tunnel can wedge host-side and jax.devices() then blocks
    forever instead of erroring)."""
    import json
    import subprocess
    import sys as _sys

    try:
        proc = subprocess.run(
            [_sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        if proc.returncode == 0:
            return
        detail = (proc.stderr or b"").decode()[-200:]
    except subprocess.TimeoutExpired:
        detail = f"jax.devices() still blocked after {timeout_s:.0f}s"
    print(json.dumps({"error": f"TPU backend init failed/hung "
                               f"({detail.strip()})"}))
    raise SystemExit(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=list(MODEL_CFGS))
    ap.add_argument("--precision", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (COMPUTE_DTYPE)")
    ap.add_argument("--geometry", type=str, default="uniform",
                    choices=["uniform", "scene"],
                    help="cloud geometry: uniform cube (the historical "
                         "protocol) or LiDAR-like surfaces "
                         "(data.pointclouds.synthetic_scene_clouds)")
    ap.add_argument("--level-capacity", type=str, default=None,
                    help="sparse MinkLoc per-level table capacities: "
                         "'auto' (calibrate on the benched clouds, "
                         "margin 1.25) or comma ints")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu for smoke runs)")
    args = ap.parse_args()

    if not args.platform:
        _backend_watchdog()

    import numpy as np
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import yaml

    from patchaugnet_tpu.models import get_model
    from patchaugnet_tpu.train.step import _global_desc

    def make_clouds(seed):
        if args.geometry == "scene":
            from patchaugnet_tpu.data.pointclouds import synthetic_scene_clouds

            return jnp.asarray(
                synthetic_scene_clouds(
                    np.random.RandomState(seed), BATCH, N_POINTS
                )
            )
        return (
            jax.random.uniform(
                jax.random.PRNGKey(seed), (BATCH, N_POINTS, 3), jnp.float32
            ) * 2 - 1
        )

    rng = jax.random.PRNGKey(0)
    for name in args.models:
        cfg = yaml.safe_load(open(MODEL_CFGS[name]))
        cfg["model_type"] = name
        if args.precision != "float32":
            cfg["COMPUTE_DTYPE"] = args.precision
        caps = None
        if name == "minkloc3dv2" and args.level_capacity:
            from patchaugnet_tpu.models.minkloc_sparse import (
                measure_level_occupancy,
                suggest_level_capacities,
            )

            if args.level_capacity == "auto":
                counts = measure_level_occupancy(
                    make_clouds(0),
                    num_levels=len(cfg.get("layers", (1, 1, 1, 1))),
                    coordinates=cfg.get("coordinates", "cartesian"),
                    quantization_step=cfg.get("quantization_step", 0.01),
                )
                caps = suggest_level_capacities(
                    counts, margin=1.25, align=256, full=N_POINTS
                )
            else:
                caps = [int(c) for c in args.level_capacity.split(",")]
            cfg["level_capacity"] = caps
        model = get_model(name, cfg)
        x = make_clouds(0)
        variables = jax.jit(model.init)(rng, x)

        fwd = jax.jit(
            lambda v, c: _global_desc(model.apply(v, c, train=False))
        )
        t0 = time.perf_counter()
        out = np.asarray(fwd(variables, x))
        compile_s = time.perf_counter() - t0
        assert np.isfinite(out).all(), name
        xs = [make_clouds(i + 1) for i in range(ITERS)]
        for i in range(WARMUP):
            np.asarray(fwd(variables, xs[i]))
        t0 = time.perf_counter()
        r = None
        for xi in xs:
            r = fwd(variables, xi)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / ITERS
        extra = {}
        if args.precision != "float32":
            extra["precision"] = args.precision
        if args.geometry != "uniform":
            extra["geometry"] = args.geometry
        if name == "minkloc3dv2":
            extra["backend"] = type(model).__name__
            extra["quantization_step"] = cfg.get("quantization_step")
            if caps is not None:
                extra["level_capacity"] = caps
        print(
            json.dumps(
                {
                    "model": name,
                    "desc_per_sec": round(BATCH / dt, 1),
                    "ms_per_batch": round(dt * 1000, 1),
                    "batch": BATCH,
                    "n_points": N_POINTS,
                    "compile_s": round(compile_s, 1),
                    **extra,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
