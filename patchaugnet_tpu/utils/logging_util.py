"""Logging + metrics.

Reference: python logging to console + train.log under a timestamped
event dir (train_place_recognition.py:57-70) and TensorBoard scalars
(:399, 414, 485-487). TensorBoard isn't guaranteed in this image, so
metrics go to a JSONL file (always) and TensorBoard when available.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def get_logger(log_dir: Optional[str] = None, name: str = "patchaugnet_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter(
        "[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsWriter:
    """Scalar metrics to JSONL (+ TensorBoard if importable)."""

    def __init__(self, event_dir: str):
        os.makedirs(event_dir, exist_ok=True)
        self._f = open(os.path.join(event_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional

            self._tb = SummaryWriter(event_dir)
        except Exception:
            pass

    def add_scalars(self, tag: str, scalars: Dict[str, float], step: int) -> None:
        rec = {"tag": tag, "step": step, "ts": time.time(), **{
            k: float(v) for k, v in scalars.items()
        }}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalars(tag, scalars, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
