#!/usr/bin/env python
"""Attribute the auction-EMD per-iteration cost on the real chip.

Measures, at the reference (4, 4096, 3) eps=0.02 workload:
  - actual auction iteration count (early-exit point);
  - the price-fused top-2 sweep's standalone per-call cost (fori of 64);
  - the full while-body per-iteration cost (iters=64 vs 256 slope).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _backend_watchdog  # noqa: E402


def main():
    _backend_watchdog()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_matmul_precision", "float32")
    from patchaugnet_tpu.ops import emd as emd_mod
    from patchaugnet_tpu.ops.pairwise import pairwise_sqdist
    from patchaugnet_tpu.ops.pallas.knn import topk_extract_price_pallas

    host = np.random.default_rng(7)
    x1 = jnp.asarray(host.random((4, 4096, 3)).astype(np.float32))
    x2 = jnp.asarray(host.random((4, 4096, 3)).astype(np.float32))

    # --- iteration count: replicate the while loop, return i ---
    def count_iters(a, b, eps, iters):
        import patchaugnet_tpu.ops.emd as m

        # reuse the real body by running _auction with instrumentation:
        # cheapest faithful probe — copy of the state machine with the
        # fused sweep, returning the final counter.
        bsz, n, _ = a.shape
        neg_base = jnp.sqrt(pairwise_sqdist(a, b)) - 3.0

        def top2_sweep(price):
            idx, neg = topk_extract_price_pallas(neg_base, price, 2, 256)
            return -neg, idx

        rows = jnp.arange(n, dtype=jnp.int32)
        batch = jnp.arange(bsz)[:, None]

        def cond(state):
            i, assignment, _, _ = state
            return jnp.logical_and(i < iters, jnp.any(assignment < 0))

        def body(state):
            i, assignment, assignment_inv, price = state
            unass = assignment < 0
            top2, top2_i = top2_sweep(price)
            best, better = top2[..., 0], top2[..., 1]
            best_i = top2_i[..., 0].astype(jnp.int32)
            inc = jnp.where(unass, best - better + eps, m._NEG)
            winner_inc = jnp.full((bsz, n), m._NEG, top2.dtype).at[
                batch, best_i].max(inc)
            has_winner = winner_inc > m._NEG / 2
            is_winner_row = jnp.logical_and(
                unass, inc >= winner_inc[batch, best_i])
            winner_row = (
                jnp.full((bsz, n), -1, jnp.int32)
                .at[batch, best_i]
                .max(jnp.where(is_winner_row, rows[None, :], -1))
            )
            evict_rows = jnp.where(
                jnp.logical_and(has_winner, assignment_inv >= 0),
                assignment_inv, n)
            assignment = (
                jnp.concatenate(
                    [assignment, jnp.full((bsz, 1), -1, jnp.int32)], axis=1)
                .at[batch, evict_rows].set(-1)[:, :n]
            )
            safe_winner = jnp.where(has_winner, winner_row, n)
            assignment = (
                jnp.concatenate(
                    [assignment, jnp.full((bsz, 1), -1, jnp.int32)], axis=1)
                .at[batch, safe_winner]
                .set(jnp.broadcast_to(rows[None, :], (bsz, n)))[:, :n]
            )
            assignment_inv = jnp.where(has_winner, winner_row, assignment_inv)
            price = jnp.where(has_winner, price + winner_inc, price)
            return i + 1, assignment, assignment_inv, price

        state = (
            jnp.zeros((), jnp.int32),
            jnp.full((bsz, n), -1, jnp.int32),
            jnp.full((bsz, n), -1, jnp.int32),
            jnp.zeros((bsz, n), jnp.float32),
        )
        i, assignment, _, _ = jax.lax.while_loop(cond, body, state)
        return i, jnp.sum(assignment < 0)

    it, left = jax.jit(lambda a, b: count_iters(a, b, 0.02, 1024))(x1, x2)
    print(json.dumps({"probe": "iters", "iterations": int(it),
                      "unassigned_at_exit": int(left)}), flush=True)

    # --- standalone sweep cost ---
    neg_base = jnp.sqrt(pairwise_sqdist(x1, x2)) - 3.0

    @jax.jit
    def sweep64(nb, price):
        def f(i, p):
            _, neg = topk_extract_price_pallas(nb, p, 2, 256)
            return p + neg[..., 0] * 1e-6
        return jax.lax.fori_loop(0, 64, f, price)

    p0 = jnp.zeros((4, 4096), jnp.float32)
    np.asarray(sweep64(neg_base, p0))
    t0 = time.perf_counter()
    np.asarray(sweep64(neg_base, p0))
    sweep_ms = (time.perf_counter() - t0) / 64 * 1000
    print(json.dumps({"probe": "sweep_ms_per_call",
                      "value": round(sweep_ms, 3)}), flush=True)

    # --- while-body slope: iters=64 vs 256 (both below convergence) ---
    times = {}
    for iters in (64, 256):
        os.environ["PCR_EMD_SWEEP"] = "fused"
        fn = jax.jit(lambda a, b, it=iters: emd_mod._auction(a, b, 0.02, it))
        np.asarray(fn(x1, x2))
        t0 = time.perf_counter()
        np.asarray(fn(x1, x2))
        times[iters] = time.perf_counter() - t0
    slope_ms = (times[256] - times[64]) / (256 - 64) * 1000
    print(json.dumps({"probe": "body_ms_per_iter",
                      "t64_s": round(times[64], 3),
                      "t256_s": round(times[256], 3),
                      "slope_ms": round(slope_ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
