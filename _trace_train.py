#!/usr/bin/env python
"""Refresh the train-step device trace at the current tree (VERDICT r4
directive: the committed profiles/train_step predates the round-3
related-subset + pipelined-metrics changes) and print the top ops by
device time with HLO op_name attribution.

Run on the real chip: python _trace_train.py [bfloat16]
Writes the trace under profiles/train_step (new timestamped subdir).
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_models import _backend_watchdog  # noqa: E402

OUT = "profiles/train_step"


def main():
    _backend_watchdog()
    import numpy as np
    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from __graft_entry__ import FULL_PARAM
    from patchaugnet_tpu import train
    from patchaugnet_tpu.losses import PatchCorrespondences
    from patchaugnet_tpu.models import get_model

    cfg = dict(
        FULL_PARAM,
        TRAIN_BATCH_SIZE=4, TRAIN_POSITIVES_PER_QUERY=2,
        TRAIN_NEGATIVES_PER_QUERY=14,
        BASE_LEARNING_RATE=5e-4, MOMENTUM=0.9, OPTIMIZER="adam",
        MAX_EPOCH=1, LEARNING_RATE_DECAY="step", MARGIN_1=0.5, MARGIN_2=0.2,
        LOSS_FUNCTION="quadruplet", LOSS_LAZY=True,
        TRIPLET_USE_BEST_POSITIVES=False, LOSS_IGNORE_ZERO_BATCH=False,
        A2B_MAX_ROWS=2048, A2B_MAX_PAIRS=16,
        use_hard_negative_patch_mining=True,
    )
    if len(sys.argv) > 1 and sys.argv[1] == "bfloat16":
        cfg["COMPUTE_DTYPE"] = "bfloat16"
    tuple_size = (
        1 + cfg["TRAIN_POSITIVES_PER_QUERY"] + cfg["TRAIN_NEGATIVES_PER_QUERY"] + 1
    )
    total = cfg["TRAIN_BATCH_SIZE"] * tuple_size
    n = cfg["NUM_POINTS"]
    rng = np.random.RandomState(0)
    clouds = jnp.asarray(rng.rand(total, n, 3).astype(np.float32))

    model = get_model("patch_aug_net", cfg)
    state = train.create_train_state(
        model, jax.random.PRNGKey(0), clouds[:2], cfg,
        init_kwargs={"with_patches": True},
    )
    step = train.build_train_step(model, cfg)

    T, M = cfg["A2B_MAX_ROWS"], cfg["SAMPLING"][0]
    n_related = cfg["TRAIN_BATCH_SIZE"] * (1 + cfg["TRAIN_POSITIVES_PER_QUERY"])
    related = np.arange(0, total, total // n_related)[:n_related]
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

    def run_once(st):
        st, metrics = step(st, clouds, corr, mask)
        return st, metrics

    state, m = run_once(state)   # compile + warm
    np.asarray(m["total"])
    print("compiled", flush=True)

    jax.profiler.start_trace(OUT)
    metrics = None
    for _ in range(5):
        state, metrics = run_once(state)
    np.asarray(metrics["total"])
    jax.profiler.stop_trace()
    print("traced", flush=True)

    path = sorted(glob.glob(os.path.join(OUT, "**/*.trace.json.gz"),
                            recursive=True))[-1]
    ev = json.load(gzip.open(path))["traceEvents"]
    tot = defaultdict(float)
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and not e.get("name", "").startswith(("$", "np.", "jit", "Pjit"))):
            tot[e["name"]] += e["dur"]
    print(f"total device-op us/iter: {sum(tot.values())/5:.0f}")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us/5000:8.2f} ms/iter  {name[:100]}")


if __name__ == "__main__":
    main()
