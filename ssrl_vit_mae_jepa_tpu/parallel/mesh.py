"""Device mesh + sharding layout.

The reference is single-device (``devices=1`` everywhere, SURVEY.md §2.4);
the TPU-native design scales through a ``jax.sharding.Mesh``:

- axis ``"data"``: batch-sharded inputs; the trainer runs the jitted step
  as ``jax.shard_map`` over this axis (``Task.configure_sharding``) with
  explicit gradient/metric ``psum`` over ICI — manual sharding is required
  because a Pallas kernel is an opaque Mosaic custom call GSPMD cannot
  partition (primary strategy per BASELINE.json),
- axis ``"model"``: optional tensor-parallel parameter sharding (Megatron
  layout: qkv/fc1 kernels column-sharded, proj/fc2 row-sharded), left
  AUTOMATIC inside the shard_map (GSPMD partitions those matmuls) — a
  scaling hook; at the reference's 1.1 M-param size DP alone is optimal.

All collectives ride ICI within the slice; no NCCL/MPI equivalent exists or
is needed (XLA emits them from the sharding annotations).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules: (regex over 'a/b/c' param path) → PartitionSpec.
# Column-parallel producers (qkv, fc1) shard their output features; the
# consumers (proj, fc2) shard the matching input dim; GSPMD inserts the
# reduce. Everything else (norms, embeddings, biases of row-parallel layers)
# stays replicated.
_TP_RULES = [
    (re.compile(r".*/(qkv|fc1)/kernel$"), P(None, "model")),
    (re.compile(r".*/(qkv|fc1)/bias$"), P("model")),
    (re.compile(r".*/(proj|fc2)/kernel$"), P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        parts.append(str(key) if key is not None else str(p))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """PartitionSpec pytree for params: TP rules if mesh has a model axis >1,
    else fully replicated."""
    use_tp = mesh.shape.get("model", 1) > 1

    def spec_for(path, leaf):
        if use_tp:
            s = _path_str(path)
            for rule, spec in _TP_RULES:
                if rule.match(s):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pytree(tree, shardings):
    """device_put a pytree against a matching sharding pytree."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
