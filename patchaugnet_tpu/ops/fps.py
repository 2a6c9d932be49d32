"""Farthest point sampling.

TPU-native equivalent of ``pointops.furthestsampling``
(/root/reference/libs/pointops/functions/pointops.py:11-29, kernel
libs/pointops/src/sampling/sampling_cuda_kernel.cu:58-168).

Semantics pinned to the CUDA kernel:
  - the first selected index is always 0;
  - a running per-point min-distance-to-selected vector is maintained
    (init 1e10) and the next centre is its argmax;
  - ties resolve to the lowest index (``jnp.argmax`` first-occurrence; the
    CUDA lockstep reduction is first-max-in-scan-order, identical for
    distinct distances).

The m-step dependence is inherently sequential; each step is a fully
vectorised O(n) distance update + argmax executed on the VPU inside one
``lax.fori_loop`` so the whole sweep stays on-device in a single XLA
program (no kernel-launch-per-step, no host sync).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import pallas

from . import contracts
from functools import partial


def farthest_point_sample(
    xyz: jax.Array, m: int, use_pallas: bool = None
) -> jax.Array:
    """Sample ``m`` of ``n`` points maximising pairwise min-distance.

    Args:
      xyz: ``(b, n, 3)`` float coordinates.
      m: number of samples (static, ``m <= n``).
      use_pallas: force the Pallas kernel on/off; ``None`` auto-selects
        it on TPU backends (identical indices, ~4x faster — the whole
        sweep runs in one kernel with VMEM-resident state).

    Returns:
      ``(b, m)`` int32 indices into ``xyz``.
    """
    contracts.check_points(xyz, "xyz")
    # m > n is allowed (duplicate indices), matching the fori_loop
    # semantics — small-cloud probes init full-size models cheaply
    assert m > 0, f"m={m} must be positive" 
    if use_pallas is None:
        use_pallas = pallas.on_tpu()
    if use_pallas and m > 1:
        from .pallas.fps import farthest_point_sample_pallas

        return farthest_point_sample_pallas(xyz, m)
    return _farthest_point_sample_xla(xyz, m)


@partial(jax.jit, static_argnums=(1,))
def _farthest_point_sample_xla(xyz: jax.Array, m: int) -> jax.Array:
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(i, state):
        min_d, idx = state
        last = idx[:, i - 1]                               # (b,)
        last_pt = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        d = jnp.sum((xyz - last_pt) ** 2, axis=-1)         # (b, n)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        idx = jax.lax.dynamic_update_index_in_dim(idx, nxt, i, axis=1)
        return min_d, idx

    min_d0 = jnp.full((b, n), 1e10, dtype=jnp.float32)
    idx0 = jnp.zeros((b, m), dtype=jnp.int32)
    if m == 1:
        return idx0
    _, idx = jax.lax.fori_loop(1, m, body, (min_d0, idx0))
    return idx
