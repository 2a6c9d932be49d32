"""Input contracts for the public point ops.

The TPU answer to the reference's CHECK_INPUT / CHECK_CONTIGUOUS macros
(``libs/pointops/src/cuda_utils.h:8-10``, ``knn.cpp:5-8``) and the
``assert x.is_contiguous()`` lines in every Python wrapper
(``pointops.py:18,39-40``): shape, rank, and dtype violations fail at
TRACE time with the argument name and the offending shape, instead of
surfacing as a cryptic XLA error (or, worse, silently broadcasting).
Contiguity has no JAX analogue (XLA owns layout), so the contracts
cover what can actually go wrong here: ranks, axis sizes, dtypes and
cross-argument agreement. Pure-Python asserts on static shapes — zero
runtime cost under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def _shape(x):
    return tuple(getattr(x, "shape", ()))


def check_points(x, name: str = "points", dims: int = 3):
    """``(B, N, dims)`` floating-point point cloud."""
    s = _shape(x)
    assert len(s) == 3 and s[-1] == dims, (
        f"{name}: expected (B, N, {dims}), got {s}"
    )
    assert jnp.issubdtype(x.dtype, jnp.floating), (
        f"{name}: expected floating dtype, got {x.dtype}"
    )
    return x


def check_features(x, name: str = "features"):
    """``(B, N, C)`` floating-point feature table."""
    s = _shape(x)
    assert len(s) == 3, f"{name}: expected (B, N, C), got {s}"
    assert jnp.issubdtype(x.dtype, jnp.floating), (
        f"{name}: expected floating dtype, got {x.dtype}"
    )
    return x


def check_indices(idx, name: str = "idx", rank=None):
    """Integer index table (optionally of fixed rank)."""
    assert jnp.issubdtype(idx.dtype, jnp.integer), (
        f"{name}: expected integer dtype, got {idx.dtype}"
    )
    if rank is not None:
        s = _shape(idx)
        assert len(s) == rank, f"{name}: expected rank {rank}, got shape {s}"
    return idx


def check_same_batch(a, b, name_a: str = "a", name_b: str = "b"):
    sa, sb = _shape(a), _shape(b)
    assert sa[0] == sb[0], (
        f"batch mismatch: {name_a} {sa} vs {name_b} {sb}"
    )


def check_k(k: int, n: int, name: str = "k"):
    assert 0 < k <= n, f"{name}={k} out of range for n={n} candidates"
