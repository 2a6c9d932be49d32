"""Pallas farthest-point-sampling kernel.

Drop-in replacement for the XLA ``lax.fori_loop`` FPS (ops/fps.py): the
whole m-step sweep runs inside ONE kernel with the running min-distance
matrix resident in VMEM — no per-step HLO loop overhead, no HBM traffic
for the distance state. Unlike the CUDA reference (one thread block per
batch element, sampling_cuda_kernel.cu:58-168), the batch axis is
vectorised across VPU sublanes: every iteration updates all B rows at
once, so the sequential m-step chain is paid once per *batch*, not once
per cloud.

Semantics identical to :func:`ops.fps.farthest_point_sample`: first
index 0, min-distance init 1e10, ties -> lowest index. Selected points
are extracted with masked reductions and written with masked vector
stores (dynamic lane indexing / scalar VMEM stores are not legal on
TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, idx_ref, mind_ref):
    # x/y/z_ref: (b, n) VMEM coords; idx_ref: (b, m) VMEM out;
    # mind_ref: (b, n) VMEM scratch.
    b, n = x_ref.shape
    m = idx_ref.shape[1]
    mind_ref[:] = jnp.full((b, n), 1e10, jnp.float32)
    idx_ref[:] = jnp.zeros((b, m), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def body(i, last):
        # last: (b, 1) previously selected index per row
        sel = (lane == last).astype(jnp.float32)           # (b, n)
        px = jnp.sum(x_ref[:, :] * sel, axis=1, keepdims=True)
        py = jnp.sum(y_ref[:, :] * sel, axis=1, keepdims=True)
        pz = jnp.sum(z_ref[:, :] * sel, axis=1, keepdims=True)
        d = (
            (x_ref[:, :] - px) ** 2
            + (y_ref[:, :] - py) ** 2
            + (z_ref[:, :] - pz) ** 2
        )
        mind = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = mind
        # manual argmax (max + lowest-index-of-max): Mosaic's argmax
        # lowering miscompiles for single-lane-tile shapes
        mx = jnp.max(mind, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(mind == mx, lane, jnp.int32(n)), axis=1, keepdims=True
        ).astype(jnp.int32)                                # (b, 1)
        idx_ref[:, :] = jnp.where(col == i, nxt, idx_ref[:, :])
        return nxt

    jax.lax.fori_loop(1, m, body, jnp.zeros((b, 1), jnp.int32))


@partial(jax.jit, static_argnums=(1,), static_argnames=("interpret",))
def farthest_point_sample_pallas(
    xyz: jax.Array, m: int, interpret: bool = False
) -> jax.Array:
    """``(b, n, 3) -> (b, m)`` int32 FPS indices via a Pallas kernel."""
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]        # (b, n) each
    return pl.pallas_call(
        _fps_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
