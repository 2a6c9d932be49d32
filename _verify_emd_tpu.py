#!/usr/bin/env python
"""Real-chip verification + A/B timing for the price-fused EMD sweep.

Three checks, printed as labelled JSON lines:
  1. kernel bit-match: topk_extract_price_pallas vs extraction from the
     materialised ``base + price`` sum, on the chip (the in-kernel
     (1, n) + (qb, n) sublane broadcast is new Mosaic machinery —
     CLAUDE.md requires on-chip verification before trusting the CPU
     suite);
  2. full-auction assignment equality: PCR_EMD_SWEEP=fused vs =chunked
     at the reference workload (4, 4096, 3) clouds;
  3. warm timing of both sweeps at the reference eps=0.02 / iters=1024
     (losses/pointnetvlad_loss.py:219,254 parameters).
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
    from patchaugnet_tpu.ops.pallas.knn import (
        topk_extract_pallas,
        topk_extract_price_pallas,
    )

    host = np.random.default_rng(7)

    # --- 1. kernel bit-match on the chip ---
    base = jnp.asarray((host.random((2, 1024, 4096)) - 0.5).astype(np.float32) * 4)
    price = jnp.asarray(host.random((2, 4096)).astype(np.float32) * 2)
    fi, fv = jax.jit(
        lambda b, p: topk_extract_price_pallas(b, p, 2, 256)
    )(base, price)
    ri, rv = jax.jit(
        lambda b, p: topk_extract_pallas(b + p[:, None, :], 2, 256)
    )(base, price)
    kernel_ok = bool(
        np.array_equal(np.asarray(fi), np.asarray(ri))
        and np.array_equal(np.asarray(fv), np.asarray(rv))
    )
    print(json.dumps({"check": "kernel_bit_match", "ok": kernel_ok}), flush=True)

    # --- 2 + 3. auction equality and timing at the reference workload ---
    x1 = jnp.asarray(host.random((4, 4096, 3)).astype(np.float32))
    x2 = jnp.asarray(host.random((4, 4096, 3)).astype(np.float32))

    results = {}
    for mode in ("chunked", "fused", "active"):
        if mode == "active":
            os.environ["PCR_EMD_SWEEP"] = "fused"
            os.environ["PCR_EMD_ACTIVE"] = "auto"
        else:
            os.environ["PCR_EMD_SWEEP"] = mode
            os.environ["PCR_EMD_ACTIVE"] = "off"
        fn = jax.jit(
            lambda a, b: emd_mod._auction(a, b, 0.02, 1024)
        )
        t0 = time.perf_counter()
        asg = np.asarray(fn(x1, x2))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x1, x2))
            times.append(time.perf_counter() - t0)
        results[mode] = {
            "assignment": asg,
            "warm_s": min(times),
            "compile_s": compile_s,
        }
        uniq = int(np.mean([len(np.unique(a)) for a in asg]))
        print(json.dumps({
            "check": f"auction_{mode}",
            "warm_s": round(results[mode]["warm_s"], 4),
            "compile_s": round(compile_s, 1),
            "mean_unique": uniq,
        }), flush=True)

    equal = bool(
        np.array_equal(results["chunked"]["assignment"],
                       results["fused"]["assignment"])
        and np.array_equal(results["chunked"]["assignment"],
                           results["active"]["assignment"])
    )
    speedup = results["chunked"]["warm_s"] / results["active"]["warm_s"]
    print(json.dumps({
        "check": "summary",
        "assignments_equal": equal,
        "kernel_bit_match": kernel_ok,
        "chunked_warm_s": round(results["chunked"]["warm_s"], 4),
        "fused_warm_s": round(results["fused"]["warm_s"], 4),
        "active_warm_s": round(results["active"]["warm_s"], 4),
        "speedup_active_vs_chunked": round(speedup, 2),
    }), flush=True)

    # --- 4. convergence-aware modes (VERDICT r4 next #3): verify the
    # way the reference verifies itself (emd_module.py:81-95) —
    # recompute the distance from the returned assignment, count
    # uniqueness — and compare mean matched sq-distance to the exact
    # mode. Target: <0.15 s warm at the reference workload.
    os.environ["PCR_EMD_SWEEP"] = "fused"
    os.environ["PCR_EMD_ACTIVE"] = "auto"
    n = int(x1.shape[1])
    exact_dist = None
    for label, kwargs in (
        ("exact", {}),
        ("floor1pct", {"unass_floor": -(-n // 100)}),
        ("floor1pct_scaled", {"unass_floor": -(-n // 100),
                              "eps_schedule": (10.0, 1.0)}),
    ):
        fn = jax.jit(
            lambda a, b, kw=kwargs: emd_mod.auction_emd(
                a, b, 0.02, 1024, **kw
            )
        )
        t0 = time.perf_counter()
        dist, asg = fn(x1, x2)
        dist, asg = np.asarray(dist), np.asarray(asg)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(x1, x2)[0])
            times.append(time.perf_counter() - t0)
        # reference-style self-verification: recomputed distance from
        # the assignment must equal the returned distance
        matched = np.take_along_axis(np.asarray(x2), asg[..., None], 1)
        recomputed = ((np.asarray(x1) - matched) ** 2).sum(-1)
        self_ok = bool(np.allclose(recomputed, dist, atol=1e-6))
        md = float(dist.mean())
        if label == "exact":
            exact_dist = md
        uniq = int(np.mean([len(np.unique(a)) for a in asg]))
        print(json.dumps({
            "check": f"mode_{label}",
            "warm_s": round(min(times), 4),
            "compile_s": round(compile_s, 1),
            "mean_sqdist": round(md, 6),
            "vs_exact_pct": round((md / exact_dist - 1) * 100, 2),
            "mean_unique": uniq,
            "self_verified": self_ok,
        }), flush=True)


if __name__ == "__main__":
    main()
