"""Profiling / cost analysis.

TPU-native equivalents of the reference's instrumentation (SURVEY §5.1):
  - fvcore ``FlopCountAnalysis`` + ``parameter_count_table``
    (utils/train_util.py:210-220, called at
    train_place_recognition.py:549-553) -> :func:`flops` /
    :func:`parameter_count` via ``jax.jit(...).lower().cost_analysis()``;
  - cuda-synchronized wall-clock timing (scene_dataset.py:531-539) ->
    :class:`DeviceTimer` (host-transfer-synced, which is also correct
    through the axon tunnel where ``block_until_ready`` returns at
    enqueue);
  - ``jax.profiler`` trace capture helper.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax


def flops(fn: Callable, *example_args, **example_kwargs) -> Optional[float]:
    """Total FLOPs of one jitted call (XLA cost analysis)."""
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", float("nan"))) if cost else None


def parameter_count(params: Any) -> Dict[str, int]:
    """Per-top-level-module parameter counts + total (the fvcore
    parameter_count_table analogue)."""
    out: Dict[str, int] = {}
    total = 0
    for name, sub in params.items():
        n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(sub))
        out[name] = n
        total += n
    out["TOTAL"] = total
    return out


class DeviceTimer:
    """Wall-clock timing with forced completion via host transfer."""

    def __init__(self):
        self.times_ms = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.times_ms.append((time.perf_counter() - t0) * 1000)

    def timed_call(self, fn: Callable, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])      # force completion
        self.times_ms.append((time.perf_counter() - t0) * 1000)
        return out

    def stats(self, skip_first: bool = True) -> Dict[str, float]:
        t = np.array(self.times_ms[1:] if skip_first and len(self.times_ms) > 1 else self.times_ms)
        return {"mean_ms": float(t.mean()), "std_ms": float(t.std()), "n": len(t)}


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
