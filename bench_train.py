#!/usr/bin/env python
"""Secondary benchmark: full PatchAugNet training-step throughput.

Measures the complete jitted train step (forward with patches +
quadruplet + a2a chamfer + a2b contrast + backward + Adam) on the
reference configuration: batch of 4 tuples x (1+2+14+1) = 72 clouds of
4096 points per step (train_place_recognition.py:148-149).

Prints one JSON line {"metric", "value", "unit"}.

Usage: bench_train.py [--tuples N] [--remat] [--precision bfloat16]
  --tuples N   tuple-batch size (default 4, the reference config)
  --remat      rematerialise the forward in the backward (cfg REMAT)
  --precision  model compute dtype (COMPUTE_DTYPE; default float32)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ITERS = 10


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
    _backend_watchdog()
    ap = argparse.ArgumentParser()
    ap.add_argument("--tuples", type=int, default=4)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--precision", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    import numpy as np
    import jax

    # measure what training actually runs: train.py pins f32 matmul
    # precision (the TPU bf16 default corrupts near-duplicate rankings)
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from __graft_entry__ import FULL_PARAM
    from patchaugnet_tpu import train
    from patchaugnet_tpu.losses import PatchCorrespondences
    from patchaugnet_tpu.models import get_model

    cfg = dict(
        FULL_PARAM,
        TRAIN_BATCH_SIZE=args.tuples, TRAIN_POSITIVES_PER_QUERY=2,
        TRAIN_NEGATIVES_PER_QUERY=14,
        BASE_LEARNING_RATE=5e-4, MOMENTUM=0.9, OPTIMIZER="adam",
        MAX_EPOCH=30, LEARNING_RATE_DECAY="step", MARGIN_1=0.5, MARGIN_2=0.2,
        LOSS_FUNCTION="quadruplet", LOSS_LAZY=True,
        TRIPLET_USE_BEST_POSITIVES=False, LOSS_IGNORE_ZERO_BATCH=False,
        A2B_MAX_ROWS=2048, A2B_MAX_PAIRS=16,
        use_hard_negative_patch_mining=True,
        REMAT=args.remat,
    )
    if args.precision != "float32":
        cfg["COMPUTE_DTYPE"] = args.precision
    total = cfg["TRAIN_BATCH_SIZE"] * (1 + 2 + 14 + 1)
    n = cfg["NUM_POINTS"]
    rng = np.random.RandomState(0)
    clouds = jnp.asarray(rng.rand(total, n, 3).astype(np.float32))

    model = get_model("patch_aug_net", cfg)
    state = train.create_train_state(
        model, jax.random.PRNGKey(0), clouds, cfg,
        init_kwargs={"with_patches": True},
    )
    step = train.build_train_step(model, cfg)

    # like the real loop: correspondences + mask cover exactly the
    # query+positive clouds (the patch branch's related subset)
    T, M = cfg["A2B_MAX_ROWS"], cfg["SAMPLING"][0]
    tuple_size = 1 + 2 + 14 + 1
    related = np.concatenate(
        [np.arange(3) + j * tuple_size for j in range(cfg["TRAIN_BATCH_SIZE"])]
    )
    corr = PatchCorrespondences(
        row_q_cloud=jnp.asarray(rng.choice(related, T), jnp.int32),
        row_n_cloud=jnp.asarray(rng.choice(related, T), jnp.int32),
        row_q_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
        row_pos_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
        row_neg_idx=jnp.asarray(rng.randint(0, M, T), jnp.int32),
        row_pair_id=jnp.asarray(rng.randint(0, cfg["A2B_MAX_PAIRS"], T), jnp.int32),
        row_valid=jnp.asarray(rng.rand(T) < 0.5),
        num_pairs=cfg["A2B_MAX_PAIRS"],
    )
    mask = jnp.zeros((total,), bool).at[jnp.asarray(related)].set(True)

    # roofline grounding (VERDICT r2 #9): FLOPs + bytes of the compiled
    # step vs v5e datasheet peaks, like bench.py does for the forward
    compiled = step.lower(state, clouds, corr, mask).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float((cost or {}).get("flops", float("nan")))
    nbytes = float((cost or {}).get("bytes accessed", float("nan")))

    state, metrics = step(state, clouds, corr, mask)       # compile
    np.asarray(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, clouds, corr, mask)
    np.asarray(metrics["total"])                            # in-order queue sync
    dt = (time.perf_counter() - t0) / ITERS
    print(
        json.dumps(
            {
                "metric": (
                    f"patch_aug_net train steps/sec ({cfg['TRAIN_BATCH_SIZE']} "
                    f"tuples x 18 clouds x 4096 pts"
                    + (", remat" if args.remat else "")
                    + (", bf16" if args.precision != "float32" else "") + ")"
                ),
                "value": round(1.0 / dt, 3),
                "unit": "steps/s",
                "ms_per_step": round(dt * 1000, 1),
                "clouds_per_sec": round(total / dt, 1),
                "mfu": round(flops / dt / 197e12, 4),
                "hbm_util": round(nbytes / dt / 819e9, 4),
                "roofline_note": (
                    "flops/bytes from XLA cost analysis vs v5e peaks "
                    "(197 TFLOP/s bf16, 819 GB/s). bytes-accessed is "
                    "LOGICAL traffic: values > 1 mean on-chip reuse "
                    "(grad accumulation re-reads), i.e. the step runs "
                    "faster than one pass of its logical bytes."
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
