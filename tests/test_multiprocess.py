"""True multi-process execution of the multi-host input path
(VERDICT r3 missing #3: §5.8's claim was proven by in-process
simulation only).

Spawns a REAL 2-process ``jax.distributed`` CPU cluster (4 virtual
devices per process, 8 global) where each process loads ONLY its
``host_batch_slice`` rows and contributes them via
``host_data.make_global_batch``, then runs one full PatchAugNet train
step (the dryrun config) as one SPMD program. Asserts:

  * both processes report the bit-identical loss (same program, same
    replicated metrics),
  * the loss matches a single-process 8-device run of the same step to
    f32 tolerance (exact equality is NOT expected across invocations:
    XLA-CPU/oneDNN reassociation — CLAUDE.md).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _worker_env():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # breaks jax backend init (CLAUDE.md)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _parse_loss(out: str, tag: str) -> float:
    for ln in out.splitlines():
        if ln.startswith("LOSS "):
            return float(ln.split(" ", 1)[1])
    raise AssertionError(f"{tag}: no LOSS line in output:\n{out[-2000:]}")


@pytest.mark.slow
def test_two_process_distributed_step_matches_single_process():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_worker_env(), cwd=os.path.dirname(HERE),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    losses = [_parse_loss(o, f"proc{i}") for i, o in enumerate(outs)]
    # one SPMD program, replicated metrics: both processes see the SAME
    # executed value
    assert losses[0] == losses[1], losses

    single = subprocess.run(
        [sys.executable, WORKER, "single"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_worker_env(), cwd=os.path.dirname(HERE), timeout=900,
    )
    assert single.returncode == 0, single.stdout[-3000:]
    loss_single = _parse_loss(single.stdout, "single")

    np.testing.assert_allclose(losses[0], loss_single, rtol=2e-4)
