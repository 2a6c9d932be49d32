#!/usr/bin/env python
"""Benchmark: PatchAugNet descriptor extraction throughput per chip.

Measures the reference's headline serving metric — global descriptors
per second on 4096-point clouds (the reference times this per cloud
with cuda-synchronized batches of 100, scene_dataset.py:531-539,
710-711; BASELINE.md north-star: descriptors/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "mfu": ..., "hbm_util": ..., "batch100_desc_per_sec": ...}

vs_baseline: no reference numbers are committed anywhere in the
reference repo (BASELINE.md) — the divisor is a documented estimate of
the PyTorch/CUDA reference on A100 (250 desc/s for PatchAugNet at
batch 100, i.e. ~4 ms/cloud).

mfu / hbm_util ground the number in hardware limits (VERDICT round 1):
FLOPs and bytes-accessed come from XLA cost analysis of the compiled
forward; peaks are TPU v5e datasheet values (197 TFLOP/s bf16,
819 GB/s HBM). The model is gather-dominated — the honest roofline is
HBM bandwidth, not the MXU.

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
V5E_PEAK_BF16_FLOPS = 197e12   # TPU v5e peak, bf16 MXU
V5E_PEAK_HBM_BYTES = 819e9     # TPU v5e HBM bandwidth
BATCH = 32
N_POINTS = 4096
WARMUP = 3
ITERS = 20
BATCH100_ITERS = 8  # reference eval protocol batch size (evaluate.py:170)


def _cost(compiled):
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return cost or {}


def _throughput(forward, variables, batch, iters, warmup=WARMUP):
    import numpy as np
    import jax
    import jax.numpy as jnp

    xs = [
        jax.random.uniform(jax.random.PRNGKey(i + 1), (batch, N_POINTS, 3))
        for i in range(iters)
    ]
    for i in range(warmup):
        np.asarray(forward(variables, xs[i % len(xs)]))
    t0 = time.perf_counter()
    out = None
    for xi in xs:
        out = forward(variables, xi)
    np.asarray(out)  # in-order queue: waits for all iters batches
    dt = time.perf_counter() - t0
    return batch * iters / dt, dt / iters


def _backend_watchdog(timeout_s: float = 600.0):
    """Fail fast (one explanatory JSON line) if backend init hangs.

    The axon tunnel can wedge host-side (observed round 3: loopback
    relay ports dead for hours; ``jax.devices()`` then blocks forever
    instead of erroring). The driver expects ONE JSON line from this
    script — a hang would stall it, so probe device init in a
    subprocess first and report the outage as data.
    """
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
    print(json.dumps({
        "metric": "patch_aug_net_desc_per_sec",
        "value": None,
        "unit": "descriptors/s/chip",
        "vs_baseline": None,
        "error": f"TPU backend init failed/hung ({detail.strip()}); "
                 "see BASELINE.md for the last recorded numbers",
    }))
    raise SystemExit(0)


def main():
    import numpy as np

    _backend_watchdog()
    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from __graft_entry__ import FULL_PARAM
    from patchaugnet_tpu.models import get_model

    model = get_model("patch_aug_net", FULL_PARAM)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, N_POINTS, 3), jnp.float32)
    variables = jax.jit(lambda k, a: model.init(k, a))(rng, x)

    def fwd(variables, clouds):
        return model.apply(variables, clouds, train=False).global_desc

    forward = jax.jit(fwd)
    compiled = forward.lower(variables, x).compile()
    cost = _cost(compiled)
    flops_per_batch = float(cost.get("flops", float("nan")))
    bytes_per_batch = float(cost.get("bytes accessed", float("nan")))

    desc_per_sec, sec_per_batch = _throughput(forward, variables, BATCH, ITERS)

    # Reference eval protocol uses batch 100 (evaluate.py:170); report it
    # alongside the batch-32 headline.
    x100 = jax.random.uniform(rng, (100, N_POINTS, 3), jnp.float32)
    forward100 = jax.jit(fwd)
    forward100.lower(variables, x100).compile()
    b100_desc_per_sec, _ = _throughput(
        forward100, variables, 100, BATCH100_ITERS, warmup=2
    )

    # Mixed-precision serving path (COMPUTE_DTYPE bf16): same f32 param
    # tree, bf16 feature path with f32 geometry/accumulation — the
    # forward is HBM-bound, so halving feature bytes is the lever past
    # the f32 roofline. Reported alongside the exact-path headline with
    # a descriptor-fidelity figure (cosine vs f32 on one batch).
    model16 = get_model(
        "patch_aug_net", dict(FULL_PARAM, COMPUTE_DTYPE="bfloat16")
    )

    def fwd16(variables, clouds):
        return model16.apply(variables, clouds, train=False).global_desc

    forward16 = jax.jit(fwd16)
    compiled16 = forward16.lower(variables, x).compile()
    bytes16 = float(_cost(compiled16).get("bytes accessed", float("nan")))
    bf16_desc_per_sec, sec16 = _throughput(forward16, variables, BATCH, ITERS)
    hbm_util16 = bytes16 / sec16 / V5E_PEAK_HBM_BYTES
    d32 = np.asarray(forward(variables, x))
    d16 = np.asarray(forward16(variables, x))
    cos = float(
        ((d32 * d16).sum(-1)
         / (np.linalg.norm(d32, axis=-1) * np.linalg.norm(d16, axis=-1))).min()
    )

    mfu = flops_per_batch / sec_per_batch / V5E_PEAK_BF16_FLOPS
    hbm_util = bytes_per_batch / sec_per_batch / V5E_PEAK_HBM_BYTES
    print(
        json.dumps(
            {
                "metric": "patch_aug_net descriptors/sec/chip (4096-pt clouds)",
                "value": round(desc_per_sec, 2),
                "unit": "descriptors/s",
                "vs_baseline": round(desc_per_sec / REFERENCE_A100_DESC_PER_SEC, 3),
                "vs_baseline_note": (
                    "divisor is a documented ESTIMATE (250 desc/s, "
                    "PyTorch/CUDA reference on A100 at batch 100); no "
                    "measured reference number exists — see BASELINE.md. "
                    "mfu/hbm_util are the measured grounding."
                ),
                "mfu": round(mfu, 4),
                "hbm_util": round(hbm_util, 4),
                "flops_per_cloud": round(flops_per_batch / BATCH),
                "batch100_desc_per_sec": round(b100_desc_per_sec, 2),
                "bf16_desc_per_sec": round(bf16_desc_per_sec, 2),
                "bf16_hbm_util": round(hbm_util16, 4),
                "bf16_desc_cosine_vs_f32": round(cos, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
