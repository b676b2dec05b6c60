"""Fused multi-head attention Pallas TPU kernel (batch-blocked, full-L VMEM).

Implemented after the end-to-end slice; until then `supported` gates it off
and `ops.attention.multi_head_attention` uses the XLA path.
"""

from __future__ import annotations


def supported(B: int, H: int, L: int, d: int, dtype_name: str) -> bool:
    return False


def mha_pallas(q, k, v):  # pragma: no cover - not yet implemented
    raise NotImplementedError
