#!/usr/bin/env python
"""Component-level on-chip timing of the sparse MinkLoc forward.

Breaks the 215 ms/batch (round 3, B=32) into:
  - quantize + build_pyramid (the 5 rank-merge sorts + route resolves)
  - FPN given a precomputed pyramid (the gather convs + matmuls)
  - one standalone zrun conv at the block1 shape (C=128)
  - one standalone lookup_rank at the level-0 map shape (biggest sort)
  - one standalone XLA row-gather at the zrun conv gather shape

Timing: enqueue ITERS calls, fetch the last result (the axon tunnel's
block_until_ready returns at enqueue; the device queue is in-order).
Prints one JSON line per component.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_models import _backend_watchdog  # noqa: E402

BATCH = 32
N = 4096
ITERS = 10


def timed(fn, *args):
    """Per-call device time. The fetched result must be TINY: the axon
    tunnel moves host transfers at ~30 MB/s, so fetching a real tensor
    measures the tunnel, not the chip (round-4 lesson: a (32,36864,384)
    gather output made a 6 ms op look like 8.8 s). Every fn is wrapped
    to reduce its output to one scalar ON DEVICE."""
    import numpy as np

    red = jax.jit(
        lambda *a: sum(
            jnp.sum(l if l.dtype.kind == "f" else l.astype(jnp.int32) * 0)
            for l in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    np.asarray(red(*args))  # compile + first run
    for _ in range(2):
        out = red(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = red(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    _backend_watchdog()
    global jax, jnp
    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    jax.config.update("jax_default_matmul_precision", "float32")

    from patchaugnet_tpu.models import get_model
    from patchaugnet_tpu.models import minkloc_sparse as ms
    from patchaugnet_tpu.ops.grouping import gather

    cfg = yaml.safe_load(open("configs/minkloc3dv2.yaml"))
    cfg["model_type"] = "minkloc3dv2"
    model = get_model("minkloc3dv2", cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, N, 3), jnp.float32) * 2 - 1
    variables = jax.jit(model.init)(rng, x)

    fwd = jax.jit(lambda v, c: model.apply(v, c, train=False))
    dt = timed(fwd, variables, x)
    print(json.dumps({"stage": "full_forward", "ms": round(dt * 1e3, 2)}),
          flush=True)

    # --- quantize + pyramid build
    step = float(cfg.get("quantization_step", 0.01))

    @jax.jit
    def build(c):
        coords, valid, dims = ms.quantize_cartesian(c, step)
        return ms.build_pyramid(coords, valid, dims, num_levels=4,
                                num_top_down=2, conv0_kernel_size=5)

    dt = timed(build, x)
    print(json.dumps({"stage": "quantize+build_pyramid",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    pyramid = build(x)
    pyramid = jax.tree_util.tree_map(jnp.asarray, pyramid)

    # --- FPN alone, given the pyramid
    fpn = ms.SparseVoxelFPN(out_channels=256, planes=(64, 128, 64, 32),
                            layers=(1, 1, 1, 1), num_top_down=2,
                            conv0_kernel_size=5, block="ECABasicBlock")
    fvars = jax.jit(fpn.init, static_argnames=())(rng, None, pyramid)
    fpn_fwd = jax.jit(lambda v, p: fpn.apply(v, None, p, train=False))
    dt = timed(fpn_fwd, fvars, pyramid)
    print(json.dumps({"stage": "fpn_given_pyramid", "ms": round(dt * 1e3, 2)}),
          flush=True)

    # --- one zrun conv at the block1 shape (C=128 -> 128, level-2 map)
    conv = ms.SparseConv(128, kernel=3)
    feats = jax.random.normal(jax.random.PRNGKey(1), (BATCH, N, 128))
    routes1 = pyramid.block_routes[1]
    cvars = jax.jit(conv.init)(rng, feats, routes1)
    conv_fwd = jax.jit(lambda v, f, r: conv.apply(v, f, r))
    dt = timed(conv_fwd, cvars, feats, routes1)
    print(json.dumps({"stage": "one_zrun_conv_c128", "ms": round(dt * 1e3, 2)}),
          flush=True)

    # --- standalone lookup_rank at the level-0 shape (25+4 cols merged)
    keys0 = pyramid.tables[0].keys
    queries = jnp.tile(keys0, (1, 29))

    @jax.jit
    def rank_fn(k, q):
        return ms.lookup_rank(k, q, with_found=False)[0]

    dt = timed(rank_fn, keys0, queries)
    print(json.dumps({"stage": "lookup_rank_level0_29cols",
                      "ms": round(dt * 1e3, 2), "q_per_item": 29 * N}),
          flush=True)

    # --- standalone XLA row-gather at the zrun gather shape
    for c in (96, 192, 384):
        table = jax.random.normal(jax.random.PRNGKey(2), (BATCH, N, c))
        idx = jax.random.randint(jax.random.PRNGKey(3), (BATCH, 9 * N), 0, N)
        g = jax.jit(gather)
        dt = timed(g, table, idx)
        rows = BATCH * 9 * N
        print(json.dumps({
            "stage": f"xla_gather_rows{9 * N}_w{c}",
            "ms": round(dt * 1e3, 2),
            "ns_per_row": round(dt * 1e9 / rows, 2),
            "gbps": round(rows * c * 4 / dt / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
