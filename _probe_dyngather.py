#!/usr/bin/env python
"""Probe: does Mosaic lower an in-kernel dynamic ROW gather from VMEM
(take/take_along_axis along the sublane axis), and how fast is it vs
the XLA row-gather at the sparse-conv shape?

The fused sparse-conv kernel design (round 4) keeps one batch item's
feature table (4096 x C <= 2 MB) resident in VMEM and needs
out[v] = feats[idx[v]] for a (V,) int32 vector — vectorized, not a
per-row scalar loop. This probes the three candidate lowerings:

  A. jnp.take(x, idx, axis=0)
  B. jnp.take_along_axis(x, idx[:, None], axis=0)  (broadcast idx)
  C. per-row fori_loop of dynamic slices (known-lowerable baseline)

Run: python _probe_dyngather.py [cpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_models import _backend_watchdog


def main():
    platform = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        _backend_watchdog()
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    V, C = 4096, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((V, C), dtype=np.float32))
    idx = jnp.asarray(np.sort(rng.integers(0, V, (V,))).astype(np.int32))
    want = np.asarray(x)[np.asarray(idx)]

    def try_variant(name, kernel):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
                interpret=(platform == "cpu"),
            )
            out = jax.jit(fn)(idx, x)
            ok = bool(np.array_equal(np.asarray(out), want))
            # time: enqueue 30, fetch last (axon queue is in-order)
            jfn = jax.jit(fn)
            jfn(idx, x)
            t0 = time.perf_counter()
            o = None
            for _ in range(30):
                o = jfn(idx, x)
            np.asarray(o)
            dt = (time.perf_counter() - t0) / 30
            print(f"{name}: exact={ok} {dt*1e6:.0f} us "
                  f"({V / dt / 1e9:.2f} G rows/s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAILED ({type(e).__name__}: {msg})", flush=True)

    def k_take(idx_ref, x_ref, o_ref):
        o_ref[:, :] = jnp.take(x_ref[:, :], idx_ref[:], axis=0)

    def k_taa(idx_ref, x_ref, o_ref):
        i = jnp.broadcast_to(idx_ref[:][:, None], (V, C))
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i, axis=0)

    def k_loop(idx_ref, x_ref, o_ref):
        def body(j, _):
            o_ref[pl.ds(j, 1), :] = x_ref[pl.ds(idx_ref[j], 1), :]
            return 0
        jax.lax.fori_loop(0, V, body, 0)

    try_variant("A jnp.take", k_take)
    try_variant("B take_along_axis", k_taa)
    try_variant("C fori dynamic-slice", k_loop)

    # XLA baseline at the same shape
    import jax.numpy as jnp2

    g = jax.jit(lambda t, i: jnp2.take(t, i, axis=0))
    g(x, idx)
    t0 = time.perf_counter()
    o = None
    for _ in range(30):
        o = g(x, idx)
    np.asarray(o)
    dt = (time.perf_counter() - t0) / 30
    print(f"XLA take baseline: {dt*1e6:.0f} us ({V / dt / 1e9:.2f} G rows/s)")


if __name__ == "__main__":
    main()
