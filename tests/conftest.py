"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding tests run against a host-platform device mesh
(the TPU answer to "test multi-node without a cluster" — the reference
has no distributed tests at all, SURVEY.md §4).
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; the
# config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def check_grads(fn, args, argnums=None, eps=1e-4, atol=1e-2, rtol=1e-2):
    """Finite-difference reverse-mode gradient check (jax.test_util was
    removed in jax 0.9)."""
    import jax
    import jax.numpy as jnp

    args = [jnp.asarray(a, dtype=jnp.float64 if a.dtype == np.float64 else jnp.float32)
            for a in args]
    if argnums is None:
        argnums = tuple(range(len(args)))

    def scalar_fn(*a):
        out = fn(*a)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return jnp.sum(out)

    grads = jax.grad(scalar_fn, argnums=argnums)(*args)
    if not isinstance(grads, tuple):
        grads = (grads,)
    for gi, argn in zip(grads, argnums):
        a = np.asarray(args[argn])
        flat = a.ravel()
        g = np.asarray(gi).ravel()
        idxs = np.random.RandomState(1).choice(flat.size, min(10, flat.size), replace=False)
        for i in idxs:
            ap, am = flat.copy(), flat.copy()
            ap[i] += eps
            am[i] -= eps
            new_args_p = list(args)
            new_args_p[argn] = jnp.asarray(ap.reshape(a.shape))
            new_args_m = list(args)
            new_args_m[argn] = jnp.asarray(am.reshape(a.shape))
            fd = (float(scalar_fn(*new_args_p)) - float(scalar_fn(*new_args_m))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, atol=atol, rtol=rtol)
