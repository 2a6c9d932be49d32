#!/usr/bin/env python
"""A/B the sparse-conv formulations on the real chip.

Runs bench_models.py --models minkloc3dv2 in a fresh subprocess per
variant (the PCR_SPARSE_CONV* knobs are read at trace time, so each
variant needs its own process/compile cache):

  zrun       — default: wide k-row windows + int-compare routing
  zrun+raw   — zrun with PCR_SPARSE_CONV_GATHER=raw (bypasses
               ops.grouping.gather's chunk heuristic inside the conv)
  im2col     — flat gather over all k^3 taps

Prints one labelled JSON line per variant.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

VARIANTS = {
    "zrun": {},
    "zrun+raw": {"PCR_SPARSE_CONV_GATHER": "raw"},
    "zrun_split": {"PCR_SPARSE_CONV": "zrun_split"},
    "im2col": {"PCR_SPARSE_CONV": "im2col"},
}


def main():
    for name, extra_env in VARIANTS.items():
        env = dict(os.environ, **extra_env)
        proc = subprocess.run(
            [sys.executable, "bench_models.py", "--models", "minkloc3dv2"],
            cwd=HERE, env=env, capture_output=True, text=True, timeout=1800,
        )
        line = None
        for ln in (proc.stdout or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
        if line is None:
            print(json.dumps({"variant": name, "error":
                              (proc.stderr or "")[-300:]}), flush=True)
            continue
        rec = json.loads(line)
        rec["variant"] = name
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
