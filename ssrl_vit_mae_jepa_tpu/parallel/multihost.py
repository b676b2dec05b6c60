"""Multi-host (multi-process) scaling hooks.

Single-host multi-chip needs nothing beyond the mesh; these helpers make the
same trainer work across hosts of a pod slice:

- ``maybe_initialize_distributed()``: env-gated ``jax.distributed``
  bootstrap (coordinator address via ``SSRL_COORDINATOR`` or the standard
  JAX env vars),
- ``process_local_indices``: shard an epoch's example indices across
  processes (each host reads only its slice of the memmap),
- ``global_batch``: assemble a globally-sharded batch from process-local
  numpy data (``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Must run before anything touches the XLA backend, so the
    already-initialized check reads the distributed client state directly —
    calling ``jax.process_count()`` here would itself initialize the backend
    and make ``jax.distributed.initialize`` raise.
    """
    coord = os.environ.get("SSRL_COORDINATOR")
    if not coord:
        return False
    from jax._src import distributed as _distributed

    if _distributed.global_state.client is not None:  # already initialized
        return True
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ.get("SSRL_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("SSRL_PROCESS_ID", "0")),
    )
    return True


def process_local_indices(
    indices: np.ndarray, process_index: int | None = None,
    process_count: int | None = None,
) -> np.ndarray:
    """Contiguous per-process shard of an index array (padded to equal size
    by wrap-around so every process sees the same number of batches)."""
    pc = process_count if process_count is not None else jax.process_count()
    pi = process_index if process_index is not None else jax.process_index()
    if pc == 1:
        return indices
    per = -(-len(indices) // pc)
    padded = np.resize(indices, per * pc)
    return padded[pi * per : (pi + 1) * per]


def global_batch(
    local_batch: Dict[str, np.ndarray], shardings: Dict[str, jax.sharding.Sharding]
) -> Dict[str, jax.Array]:
    """Process-local host arrays → globally sharded jax.Arrays."""
    return {
        k: jax.make_array_from_process_local_data(shardings[k], v)
        for k, v in local_batch.items()
    }
