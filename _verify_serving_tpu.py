#!/usr/bin/env python
"""Real-chip check of the StableHLO serving export (round 3).

Exports the flagship PatchAugNet eval forward at the reference config
(B=32, 4096-pt clouds) ON the TPU — so the artifact embeds the Mosaic
kernels — then measures the served artifact against the live jitted
forward on the same batches: throughput parity and descriptor
agreement. Evidence destination: BASELINE.md serving section.

Timing uses bench.py's enqueue-K/fetch-last pattern (axon's
block_until_ready returns at enqueue).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 32
N_POINTS = 4096
WARMUP = 3
ITERS = 20


def _throughput(fn, xs):
    import numpy as np

    for i in range(WARMUP):
        np.asarray(fn(xs[i % len(xs)]))
    t0 = time.perf_counter()
    out = None
    for xi in xs:
        out = fn(xi)
    np.asarray(out)
    dt = time.perf_counter() - t0
    return BATCH * len(xs) / dt


def main():
    # fail fast if the axon relay is wedged (ADVICE r3: every real-TPU
    # entry point needs this — jax.devices() otherwise blocks forever)
    from bench_models import _backend_watchdog

    _backend_watchdog()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import yaml

    jax.config.update("jax_default_matmul_precision", "float32")

    from patchaugnet_tpu import serving, train
    from patchaugnet_tpu.models import get_model
    from patchaugnet_tpu.train.step import _global_desc

    cfg = yaml.safe_load(open("configs/patch_aug_net.yaml"))
    cfg["model_type"] = "patch_aug_net"
    precision = sys.argv[1] if len(sys.argv) > 1 else "float32"
    if precision != "float32":
        cfg["COMPUTE_DTYPE"] = precision
    model = get_model("patch_aug_net", cfg)
    x0 = jnp.zeros((BATCH, N_POINTS, 3))
    state = train.create_train_state(
        model, jax.random.PRNGKey(cfg.get("MANUAL_SEED", 123)), x0, cfg,
        init_kwargs={"with_patches": True},
    )
    variables = state.variables

    print("exporting on", jax.default_backend(), flush=True)
    t0 = time.perf_counter()
    exported = serving.export_descriptor_fn(model, variables, BATCH, N_POINTS)
    path = "/tmp/pan_serving_b32.shlo"
    serving.save_artifact(exported, path, {"model_type": "patch_aug_net"})
    print(f"exported in {time.perf_counter()-t0:.1f}s: "
          f"{os.path.getsize(path)/1e6:.1f} MB, platforms="
          f"{list(exported.platforms)}", flush=True)

    served, _ = serving.load_artifact(path)
    live = jax.jit(
        lambda c: _global_desc(model.apply(variables, c, train=False))
    )

    xs = [
        jax.random.uniform(jax.random.PRNGKey(i + 1), (BATCH, N_POINTS, 3))
        for i in range(ITERS)
    ]

    d_live = np.asarray(live(xs[0]))      # also triggers the live compile
    d_served = np.asarray(served(xs[0]))  # and the served compile
    diff = float(np.abs(d_live - d_served).max())

    live_rate = _throughput(live, xs)
    served_rate = _throughput(served, xs)

    print(json.dumps({
        "metric": "serving_artifact_desc_per_sec",
        "precision": precision,
        "served": round(served_rate, 1),
        "live": round(live_rate, 1),
        "ratio": round(served_rate / live_rate, 4),
        "max_desc_diff": diff,
        "artifact_mb": round(os.path.getsize(path) / 1e6, 1),
        "platforms": list(exported.platforms),
    }))


if __name__ == "__main__":
    main()
