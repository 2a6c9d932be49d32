#!/usr/bin/env python
"""Capture a device trace of the composed sparse MinkLoc forward and
print the top ops by total device time (diagnosing the round-4
composition gap: build 4 ms + FPN 140 ms measured apart, 356 ms
composed)."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_models import _backend_watchdog  # noqa: E402

OUT = "profiles/sparse_fwd"


def main():
    _backend_watchdog()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import yaml

    jax.config.update("jax_default_matmul_precision", "float32")
    from patchaugnet_tpu.models import get_model

    cfg = yaml.safe_load(open("configs/minkloc3dv2.yaml"))
    cfg["model_type"] = "minkloc3dv2"
    model = get_model("minkloc3dv2", cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (32, 4096, 3), jnp.float32) * 2 - 1
    variables = jax.jit(model.init)(rng, x)
    fwd = jax.jit(
        lambda v, c: jnp.sum(model.apply(v, c, train=False))
    )
    np.asarray(fwd(variables, x))  # compile + warm
    print("compiled", flush=True)

    jax.profiler.start_trace(OUT)
    out = None
    for _ in range(5):
        out = fwd(variables, x)
    np.asarray(out)
    jax.profiler.stop_trace()
    print("traced", flush=True)

    path = sorted(glob.glob(os.path.join(OUT, "**/*.trace.json.gz"),
                            recursive=True))[-1]
    ev = json.load(gzip.open(path))["traceEvents"]
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            # keep only device-lane ops (XLA op events carry args.run_id
            # or long fusion names); skip python/host lanes by pid name
            tot[name] += e["dur"]
            cnt[name] += 1
    ranked = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"{'us_total':>10} {'n':>4}  name")
    for name, us in ranked[:40]:
        print(f"{us:10.0f} {cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
