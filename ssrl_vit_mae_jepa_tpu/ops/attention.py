"""Multi-head attention dispatch: XLA path + fused Pallas TPU kernels.

Replaces the torch SDPA/cuDNN attention the reference reaches through timm
(reference ``src/models/mae.py:28-36`` via ``timm`` blocks). Sequences here
are tiny (37 kept tokens for the masked MAE encoder, 145 for the decoder /
classifier — SURVEY.md §5.7); three implementations exist, in order of
construction (measured lineage in docs/PERFORMANCE.md):

- ``mha_xla``: einsum attention on (B, H, L, d) — always correct, the CPU/
  test path and the parity reference,
- ``attention_pallas.mha_pallas``: per-head fused kernel, VMEM-resident
  scores (first kernel; kept for ablation via ``impl="pallas"``),
- ``attention_pallas_stacked.mha_stacked``: the production kernel — all
  heads in one GEMM pair per image on the natural (B, L, H·d) layout
  (``mha_natural`` below; the model's ``impl="auto"`` uses it on TPU and
  ``impl="packed"`` forces it, e.g. under interpret mode in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


#: every attn_impl string any layer understands. A typo'd impl must raise,
#: not silently behave as "auto" (e.g. forcing "XLA" for a parity check and
#: silently getting the kernel under test instead).
KNOWN_IMPLS = frozenset(
    {"auto", "xla", "pallas", "packed", "stacked", "block", "split",
     "split_pad", "chain"}
)


def validate_impl(impl: str) -> str:
    if impl not in KNOWN_IMPLS:
        raise ValueError(
            f"unknown attn_impl {impl!r}; expected one of {sorted(KNOWN_IMPLS)}"
        )
    return impl


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def mha_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Attention over (B, H, L, d) tensors → (B, H, L, d)."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.lru_cache(maxsize=None)
def _pallas_supported(B: int, H: int, L: int, d: int, dtype_name: str) -> bool:
    from ssrl_vit_mae_jepa_tpu.ops import attention_pallas

    return attention_pallas.supported(B, H, L, d, dtype_name)


@functools.lru_cache(maxsize=None)
def _stacked_supported(B: int, H: int, L: int, D: int, dtype_name: str) -> bool:
    from ssrl_vit_mae_jepa_tpu.ops import attention_pallas_stacked

    return attention_pallas_stacked.supported(B, H, L, D, dtype_name)


def use_packed(B: int, L: int, D: int, num_heads: int, dtype, impl: str) -> bool:
    """Policy for the natural-layout fused kernels.

    Measured on v5e (B=2048, fwd+bwd per call): decoder shape 16.9 ms
    (head-stacked) vs 21.7 ms (slot-packed) vs 42.6 ms (XLA) vs 32.7 ms
    (per-head pallas); encoder shape 8.4 / 9.4 / 9.9 / 20.8 ms — and the
    natural-layout path additionally removes all (B, H, L, d) transposes.
    """
    if impl == "xla" or impl == "pallas":
        return False
    try:
        ok = _stacked_supported(B, num_heads, L, D, str(dtype))
    except Exception:
        return False
    if impl == "packed":
        if not ok:
            raise ValueError(
                f"fused attention unsupported for B={B} L={L} D={D} H={num_heads}"
            )
        return True
    # auto excludes D < 128 (sub-lane-tile model dim): measured HARD FAULT
    # of the v5e worker at the JEPA-predictor shape (L=145, D=96, d=16) in
    # the stacked-QKV kernel and the fused-block kernels, while every
    # D=144/192 shape passes. The trigger is the fused (L, 3D) qkv tensor's
    # in-kernel lane slices at non-tile offsets (96/192) combined with the
    # 96→128 lane padding; the SPLIT-input stacked kernel (separate q/k/v,
    # `mha_stacked`) runs the same shape correctly (measured) and is what
    # `use_stacked_split` routes to. Forcing impl="packed" still allows the
    # qkv form (interpret tests).
    if D < 128 or (D // num_heads) < 24:
        return False
    return ok and _on_tpu()


def use_stacked_split(B: int, L: int, D: int, num_heads: int, dtype, impl: str) -> bool:
    """Auto policy for the split-input stacked kernel on sub-lane-tile dims.

    Shapes `use_packed` rejects only for the D<128 fused-qkv fault (e.g.
    the JEPA predictor, L=145/D=96/d=16) still run the head-stacked kernel
    via its separate-q/k/v entry point — hardware-validated at exactly that
    shape — recovering the round-1 JEPA kernel path.
    """
    if impl not in ("auto",):
        return False
    if D >= 128:
        # use_packed handles D>=128 with head dim >= 24; D>=128 with a
        # SMALLER head dim (e.g. D=128/H=8) is claimed by neither policy and
        # falls back to XLA — the documented fault class is batch/G-dependent
        # and only D<128 shapes are hardware-validated on this kernel
        # (G is pinned to 1 for D<128 in attention_pallas_stacked._group)
        return False
    try:
        ok = _stacked_supported(B, num_heads, L, D, str(dtype))
    except Exception:
        return False
    return ok and _on_tpu()


def mha_natural(q, k, v, num_heads: int):
    """Head-stacked fused attention on natural (B, L, D) layout."""
    from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import mha_stacked

    return mha_stacked(q, k, v, num_heads)


def mha_natural_qkv(qkv, num_heads: int):
    """Head-stacked fused attention on the fused (B, L, 3D) qkv tensor."""
    from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import mha_stacked_qkv

    return mha_stacked_qkv(qkv, num_heads)


def multi_head_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Dispatch attention over (B, H, L, d) tensors."""
    if impl == "xla":
        return mha_xla(q, k, v)
    B, H, L, d = q.shape
    if impl in ("pallas", "auto"):
        try:
            supported = _pallas_supported(B, H, L, d, str(q.dtype))
        except Exception:
            supported = False
        # auto: the fused kernel wins for the 145-token decoder/classifier
        # sequences (measured 63 vs 84 ms fwd+bwd at B=4096 on v5e) by keeping
        # scores in VMEM; for the 37-token masked encoder XLA's batched path
        # is faster (12.5 vs 17.9 ms) — both are MXU-pass-bound (SURVEY of
        # measurements in ops/attention_pallas.py docstring).
        worth_it = impl == "pallas" or L >= 64
        if supported and worth_it and (_on_tpu() or impl == "pallas"):
            from ssrl_vit_mae_jepa_tpu.ops import attention_pallas

            return attention_pallas.mha_pallas(q, k, v)
        if impl == "pallas":
            raise ValueError(
                f"pallas attention unsupported for shape B={B} H={H} L={L} d={d}"
            )
    return mha_xla(q, k, v)
