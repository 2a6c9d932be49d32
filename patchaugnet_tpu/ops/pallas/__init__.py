"""Pallas TPU kernels (drop-in replacements for the XLA op versions)."""
import jax

from .fps import farthest_point_sample_pallas


def on_tpu() -> bool:
    """True when the default backend is a real TPU.

    Mosaic kernels are TPU-only: gating on ``!= "cpu"`` would dispatch
    them on any other accelerator backend (e.g. GPU) and fail, so every
    use_pallas decision in ops/ routes through this one predicate.
    """
    return jax.default_backend() == "tpu"


__all__ = ["farthest_point_sample_pallas", "on_tpu"]
