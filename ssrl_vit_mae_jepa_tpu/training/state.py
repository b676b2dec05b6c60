"""Train state pytree."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    rng: Any
    step: jnp.ndarray  # global step counter (int32 scalar)
    extra: Any = None  # task-specific (e.g. JEPA EMA target params)
