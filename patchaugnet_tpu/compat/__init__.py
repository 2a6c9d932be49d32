"""Compatibility loaders (reference torch checkpoints -> flax params)."""
from .torch_loader import load_torch_checkpoint

__all__ = ["load_torch_checkpoint"]
