"""ctypes bindings for the native data-path kernels (with numpy fallback).

Builds ``batch_gather.cpp`` with g++ on first use (cached as
``_batch_gather.so`` next to the source; atomic rename so concurrent
imports are safe) and exposes :func:`gather_nhwc`. Environments without a
compiler transparently fall back to the numpy implementation.

Set ``SSRL_DISABLE_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "batch_gather.cpp"
_SO = _HERE / "_batch_gather.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=_HERE, delete=False
        ) as tmp:
            tmp_path = Path(tmp.name)
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-pthread",
            "-std=c++17", str(_SRC), "-o", str(tmp_path),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp_path, _SO)
        return True
    except Exception:
        try:
            tmp_path.unlink(missing_ok=True)  # type: ignore[possibly-undefined]
        except Exception:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SSRL_DISABLE_NATIVE") == "1":
        return None
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.gather_nhwc.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.gather_nhwc.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def gather_nhwc(
    raw: np.ndarray, indices: np.ndarray, n_threads: int = 0
) -> np.ndarray:
    """(N, C, W, H) uint8 raw + (B,) indices → (B, H, W, C) uint8.

    Uses the native threaded kernel when available, numpy otherwise.
    """
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    N, C, W, H = raw.shape
    B = len(indices)
    # the C kernel does raw pointer arithmetic: out-of-range indices would
    # read out of bounds (or segfault) instead of numpy's clean IndexError —
    # make both paths fail identically
    if B and (indices.min() < 0 or indices.max() >= N):
        raise IndexError(
            f"gather_nhwc indices out of range [0, {N}): "
            f"min={indices.min()}, max={indices.max()}"
        )
    lib = _load()
    if lib is None:
        batch = np.asarray(raw[indices])  # (B, C, W, H)
        return np.ascontiguousarray(batch.transpose(0, 3, 2, 1))
    out = np.empty((B, H, W, C), np.uint8)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    if not raw.flags["C_CONTIGUOUS"]:
        raw = np.ascontiguousarray(raw)
    lib.gather_nhwc(
        raw.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data,
        B, N, C, W, H,
        out.ctypes.data,
        n_threads,
    )
    return out
