#!/usr/bin/env python
"""Probe: is the 111.6 ms/step train wall time host/tunnel dispatch
rather than device time? The round-4 train trace shows only ~21.7 ms
of device ops per step. If a lax.scan chain of E steps in ONE dispatch
runs at ~E x 22 ms, the loop is dispatch-bound and an epoch-scan fast
path is worth ~4-5x.

Run: python _probe_scan_train.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_models import _backend_watchdog

E = 8  # steps per scan chunk


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
    from patchaugnet_tpu.train.step import make_loss_fn

    cfg = dict(
        FULL_PARAM,
        TRAIN_BATCH_SIZE=4, TRAIN_POSITIVES_PER_QUERY=2,
        TRAIN_NEGATIVES_PER_QUERY=14,
        BASE_LEARNING_RATE=5e-4, MOMENTUM=0.9, OPTIMIZER="adam",
        MAX_EPOCH=30, LEARNING_RATE_DECAY="step", MARGIN_1=0.5, MARGIN_2=0.2,
        LOSS_FUNCTION="quadruplet", LOSS_LAZY=True,
        TRIPLET_USE_BEST_POSITIVES=False, LOSS_IGNORE_ZERO_BATCH=False,
        A2B_MAX_ROWS=2048, A2B_MAX_PAIRS=16,
        use_hard_negative_patch_mining=True,
    )
    total = cfg["TRAIN_BATCH_SIZE"] * 18
    n = cfg["NUM_POINTS"]
    rng = np.random.RandomState(0)
    clouds = jnp.asarray(rng.rand(total, n, 3).astype(np.float32))

    model = get_model("patch_aug_net", cfg)
    state = train.create_train_state(
        model, jax.random.PRNGKey(0), clouds, cfg,
        init_kwargs={"with_patches": True},
    )
    T, M = cfg["A2B_MAX_ROWS"], cfg["SAMPLING"][0]
    related = np.concatenate([np.arange(3) + j * 18 for j in range(4)])
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

    loss_fn = make_loss_fn(model, cfg)

    def body(st, xs):
        cl, ms = xs
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            st.params, st.batch_stats, cl, corr, ms
        )
        nonzero = metrics["total"] > 1e-10
        st = st.apply_gradients(
            jax.tree_util.tree_map(lambda g: jnp.where(nonzero, g, 0.0), grads),
            new_bs,
        )
        return st, metrics["total"]

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps(st, clouds_stack, mask_stack):
        return jax.lax.scan(body, st, (clouds_stack, mask_stack))

    clouds_stack = jnp.broadcast_to(clouds, (E,) + clouds.shape)
    mask_stack = jnp.broadcast_to(mask, (E,) + mask.shape)

    t0 = time.perf_counter()
    state, tots = scan_steps(state, clouds_stack, mask_stack)
    np.asarray(tots)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        state, tots = scan_steps(state, clouds_stack, mask_stack)
    np.asarray(tots)
    dt = (time.perf_counter() - t0) / (iters * E)
    print(f"scan chunk: {dt*1000:.1f} ms/step ({1/dt:.2f} steps/s) "
          f"at E={E}", flush=True)


if __name__ == "__main__":
    main()
