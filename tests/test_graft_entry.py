"""The driver gate: dryrun_multichip must self-provision its mesh.

Round-1 failure mode (VERDICT.md item 1): the driver imports
``__graft_entry__`` in a process bound to ONE real TPU chip and calls
``dryrun_multichip(8)`` — the function must not depend on the caller
having pre-configured a virtual CPU mesh.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions():
    # Simulate the driver: a process whose jax sees a single CPU device
    # (stand-in for the single axon TPU chip) imports the module and
    # calls dryrun_multichip(8).
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; assert len(jax.devices()) == 1, jax.devices();"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "one PatchAugNet train step OK" in proc.stdout
