"""Profiler hooks: jax.profiler traces + a step-timing context.

The reference has no tracing beyond Lightning's progress bar (SURVEY.md
§5.1); here every run can capture an XLA/TPU trace viewable in
TensorBoard's profile plugin or Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str | Path | None) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir)):
        yield


class StepTimer:
    """Cheap rolling step timer (host wall clock; device-async aware callers
    should place it around value fetches)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0
