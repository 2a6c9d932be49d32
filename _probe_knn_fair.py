#!/usr/bin/env python
"""Fair fused-vs-split kNN A/B: both paths as ONE jitted function
(the in-model situation), level-1 shape."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from patchaugnet_tpu.ops.pallas.knn import knn_fused_pallas, knn_pallas

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


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for k in (20,):
        kx, kq = jax.random.split(jax.random.PRNGKey(k))
        xyz = jax.random.uniform(kx, (B, N, 3), jnp.float32) * 2 - 1
        nxy = jax.random.uniform(kq, (B, M, 3), jnp.float32) * 2 - 1
        split = jax.jit(lambda a, b, _k=k: knn_pallas(a, b, _k))
        fused = jax.jit(lambda a, b, _k=k: knn_fused_pallas(a, b, _k))
        i0, v0 = jax.tree_util.tree_map(np.asarray, split(xyz, nxy))
        i1, v1 = jax.tree_util.tree_map(np.asarray, fused(xyz, nxy))
        print(f"k={k} jitted: idx_eq={bool((i0==i1).all())} "
              f"val_eq={bool((v0==v1).all())}", flush=True)
        t_s = timeit(split, xyz, nxy)
        t_f = timeit(fused, xyz, nxy)
        print(f"k={k} jitted: split={t_s*1e3:.2f}ms fused={t_f*1e3:.2f}ms "
              f"speedup={t_s/t_f:.3f}x", flush=True)
