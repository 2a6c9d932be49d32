"""AOT serving export — self-contained StableHLO descriptor extractors.

The TPU-native deployment story the reference's eval pipeline implies
but never ships: the reference serves descriptors by carrying the whole
training repo to the serving host (model zoo + 4 compiled CUDA
extensions + a torch checkpoint, ``/root/reference/place_recognition/
evaluate.py:167-186``). Here the jitted eval forward is captured with
``jax.export`` into ONE serialized artifact with the trained weights
baked in as StableHLO constants. A serving host needs jax and the
artifact — no model code, no config, no checkpoint, no tracing at
startup (XLA compiles straight from the portable StableHLO module).

Two artifact flavours, mirroring the two eval forwards
(``train/step.py::build_forward_fn`` / ``build_local_forward_fn``):

- global: ``(B, N, 3) f32 -> (B, D) f32`` descriptors;
- local (patch_aug_net / pptnet): ``(B, N, 3) -> (global, local
  features, centre indices)`` — the tuple the rerank pipeline's
  local-descriptor store consumes.

Platform note: ops dispatch Pallas kernels by ``jax.default_backend()``
at TRACE time (``ops/knn.py``), so an artifact exported on a TPU host
embeds the Mosaic kernels and runs only on TPU; exporting on a CPU host
takes the bit-equivalent XLA fallbacks and yields a portable (slower)
artifact. ``export_platforms`` records the lowering platforms either
way, and ``jax.export`` refuses mismatched execution.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

_META_SUFFIX = ".json"
_FORMAT = "patchaugnet-tpu-serving/1"


def export_descriptor_fn(
    model,
    variables,
    batch_size: int,
    n_points: int,
    *,
    with_local: bool = False,
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Capture the eval forward (weights closed over) as an Exported.

    ``with_local=True`` exports the (global, local, center_idx) tuple for
    models that expose locals; raises for models without them.
    """
    # local import: keeps load_artifact (the serving-host entry point)
    # importable without flax/optax — the export side is the only
    # consumer of model/train machinery (ADVICE r3)
    from .train.step import _global_desc, _has_local_fields

    if with_local and not _has_local_fields(model):
        raise ValueError(
            f"{type(model).__name__} exposes no local descriptors; "
            "export the global-only artifact instead"
        )

    if with_local:

        def fwd(clouds):
            out = model.apply(variables, clouds, train=False)
            return (
                _global_desc(out),
                out.fp_features[-2],
                out.center_idx_origin[0],
            )

    else:

        def fwd(clouds):
            return _global_desc(model.apply(variables, clouds, train=False))

    spec = jax.ShapeDtypeStruct((batch_size, n_points, 3), jnp.float32)
    kwargs: Dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(fwd), **kwargs)(spec)


def save_artifact(
    exported: jax_export.Exported, path: str, meta: Optional[Dict[str, Any]] = None
) -> None:
    """Write the serialized StableHLO module + a JSON sidecar
    (``<path>.json``) describing it for humans and serving routers."""
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    record = {
        "format": _FORMAT,
        "jax_version": jax.__version__,
        "export_platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "bytes": len(blob),
    }
    record.update(meta or {})
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(record, f, indent=2)


def load_artifact(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize an artifact into a jitted ``clouds -> descriptors``
    callable (plus its sidecar metadata, ``{}`` if the sidecar is gone).

    The returned callable is ``jax.jit``-wrapped so repeated serving
    calls reuse one executable instead of re-running the exported
    module's calling convention per call.
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta: Dict[str, Any] = {}
    if os.path.exists(path + _META_SUFFIX):
        with open(path + _META_SUFFIX) as f:
            meta = json.load(f)
    return jax.jit(exported.call), meta
