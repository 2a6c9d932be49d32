#!/usr/bin/env python
"""Benchmark: PatchAugNet descriptor extraction throughput per chip.

Measures the reference's headline serving metric — global descriptors
per second on 4096-point clouds (the reference times this per cloud
with cuda-synchronized batches of 100, scene_dataset.py:531-539,
710-711; BASELINE.md north-star: descriptors/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: no reference numbers are committed anywhere in the
reference repo (BASELINE.md) — the divisor is a documented estimate of
the PyTorch/CUDA reference on A100 (250 desc/s for PatchAugNet at
batch 100, i.e. ~4 ms/cloud).

Timing note: on the axon tunnel ``block_until_ready`` returns at
enqueue; we therefore enqueue K batches (in-order device queue) and
fetch only the final result, so wall clock ~= K * compute + 1 RTT.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_A100_DESC_PER_SEC = 250.0  # documented estimate, see docstring
BATCH = 32
N_POINTS = 4096
WARMUP = 3
ITERS = 20


def main():
    import numpy as np
    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from __graft_entry__ import FULL_PARAM
    from patchaugnet_tpu.models import get_model

    model = get_model("patch_aug_net", FULL_PARAM)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, N_POINTS, 3), jnp.float32)
    variables = jax.jit(lambda k, a: model.init(k, a))(rng, x)

    @jax.jit
    def forward(variables, clouds):
        return model.apply(variables, clouds, train=False).global_desc

    xs = [
        jax.random.uniform(jax.random.PRNGKey(i + 1), (BATCH, N_POINTS, 3))
        for i in range(ITERS)
    ]
    # warm up + compile, force real completion via host transfer
    for i in range(WARMUP):
        np.asarray(forward(variables, xs[i % len(xs)]))

    t0 = time.perf_counter()
    out = None
    for xi in xs:
        out = forward(variables, xi)
    np.asarray(out)  # in-order queue: waits for all ITERS batches
    dt = time.perf_counter() - t0

    desc_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "patch_aug_net descriptors/sec/chip (4096-pt clouds)",
                "value": round(desc_per_sec, 2),
                "unit": "descriptors/s",
                "vs_baseline": round(desc_per_sec / REFERENCE_A100_DESC_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
