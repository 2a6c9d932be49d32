#!/usr/bin/env python
"""Round-5 on-chip probes for the kNN extraction kernel (VERDICT #8).

1. Pair-extraction kernel (``topk_extract_pair_pallas``): bit-equality
   vs the shipping flat kernel + timing at the level-1 shape
   (B=32, m=1024, n=4096; k=20 and 40).
2. Dated Mosaic re-probe of the round-1 ``(qb, 1) x (1, n)``
   broadcast-in-kernel miscompile (the reason knn_pallas computes the
   distance matrix in XLA): a minimal kernel computing
   ``(a - b)**2`` from a (qb, 1) and a (1, n) block, checked against
   the XLA value on-chip.

Timing uses the enqueue-K-fetch-last protocol (axon block_until_ready
returns at enqueue; see bench.py).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchaugnet_tpu.ops.pallas.knn import (
    knn_fused_pallas,
    knn_pallas,
    topk_extract_pallas,
    topk_extract_pair_pallas,
)

B, M, N = 32, 1024, 4096
ITERS, WARM = 30, 3


def timeit(fn, *args):
    r = None
    for _ in range(WARM):
        r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)
    return (time.perf_counter() - t0) / ITERS


def probe_pair():
    for k in (20, 40):
        d = jax.random.uniform(jax.random.PRNGKey(k), (B, M, N), jnp.float32)
        i0, v0 = jax.tree_util.tree_map(
            np.asarray, topk_extract_pallas(d, k)
        )
        i1, v1 = jax.tree_util.tree_map(
            np.asarray, topk_extract_pair_pallas(d, k, query_block=128)
        )
        exact = bool((i0 == i1).all() and (v0 == v1).all())
        t_flat = timeit(topk_extract_pallas, d, k)
        t_pair = timeit(partial(topk_extract_pair_pallas, query_block=128), d, k)
        print(
            f"k={k}: bit_exact={exact} flat={t_flat*1e3:.2f}ms "
            f"pair={t_pair*1e3:.2f}ms speedup={t_flat/t_pair:.3f}x",
            flush=True,
        )


def _bcast_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = (a_ref[:, :] - b_ref[:, :]) ** 2


def probe_bcast():
    qb, n = 256, 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (qb, 1), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (1, n), jnp.float32)
    out = pl.pallas_call(
        _bcast_kernel,
        in_specs=[
            pl.BlockSpec((qb, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, n), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qb, n), jnp.float32),
    )(a, b)
    ref = (a - b) ** 2
    got, want = np.asarray(out), np.asarray(ref)
    ok = bool((got == want).all())
    print(f"(qb,1)x(1,n) broadcast kernel: bit_exact={ok} "
          f"maxdiff={np.abs(got - want).max():.3e}", flush=True)


def probe_fused():
    """End-to-end split (XLA distances + extraction kernel) vs fused
    (distances in-kernel) at the level-1 shape."""
    for k in (20, 40):
        kx, kq = jax.random.split(jax.random.PRNGKey(k))
        xyz = jax.random.uniform(kx, (B, N, 3), jnp.float32) * 2 - 1
        nxy = jax.random.uniform(kq, (B, M, 3), jnp.float32) * 2 - 1
        i0, v0 = jax.tree_util.tree_map(np.asarray, knn_pallas(xyz, nxy, k))
        i1, v1 = jax.tree_util.tree_map(
            np.asarray, knn_fused_pallas(xyz, nxy, k)
        )
        idx_eq = bool((i0 == i1).all())
        val_eq = bool((v0 == v1).all())
        vmax = float(np.abs(v0 - v1).max())
        t_split = timeit(knn_pallas, xyz, nxy, k)
        t_fused = timeit(knn_fused_pallas, xyz, nxy, k)
        print(
            f"fused k={k}: idx_bit_exact={idx_eq} val_bit_exact={val_eq} "
            f"val_maxdiff={vmax:.3e} split={t_split*1e3:.2f}ms "
            f"fused={t_fused*1e3:.2f}ms speedup={t_split/t_fused:.3f}x",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    try:
        probe_bcast()
    except Exception as e:  # a compile error is also a finding
        print(f"(qb,1)x(1,n) broadcast kernel FAILED to compile/run: {e!r}",
              flush=True)
    probe_fused()
    probe_pair()
