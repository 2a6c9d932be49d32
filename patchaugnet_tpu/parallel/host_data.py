"""Per-host input feeding for multi-host meshes (SURVEY §5.8).

``train.py`` on one host materialises the full global batch and lets
``jit``'s in_shardings distribute it — fine for one host x N chips. On
a pod slice every host must load ONLY the records its own devices
consume and contribute them to one global ``jax.Array``
(``jax.make_array_from_process_local_data``). This module carries the
two pieces that make that correct:

  - :func:`host_batch_slice` — the contiguous global-batch rows this
    process owns. With a 1-D ``data`` mesh built over ``jax.devices()``
    (process-major ordering, which :func:`..mesh.make_mesh` preserves),
    ``NamedSharding(P("data"))`` splits the batch into per-device
    contiguous chunks in device order, so a host's rows are exactly the
    contiguous span covering its devices — verified against the actual
    ``addressable_shards`` layout in tests/test_host_data.py.
  - :func:`make_global_batch` — assemble the distributed global array
    from this host's local rows; single-process falls back to a plain
    sharded ``device_put`` (bitwise the same layout).

The reference has no multi-host story at all (``nn.DataParallel``
only, SURVEY §2 parallelism inventory); this closes §5.8's multi-host
input clause in a form testable on the virtual CPU mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_batch_slice(
    global_batch: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """The contiguous rows of the global batch this process must load."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0, (
        f"global batch {global_batch} must split evenly over {pc} hosts"
    )
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)


def host_record_indices(
    indices: Sequence[int],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list:
    """Subset of a global batch's record indices this host loads."""
    return list(indices[host_batch_slice(len(indices), process_index, process_count)])


def make_global_batch(
    mesh: Mesh, local_rows: np.ndarray, axis_name: str = "data"
) -> jax.Array:
    """Global batch-sharded array from THIS host's rows.

    ``local_rows`` must be exactly :func:`host_batch_slice` of the
    global batch (the whole batch on a single process).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(sharding, local_rows)
