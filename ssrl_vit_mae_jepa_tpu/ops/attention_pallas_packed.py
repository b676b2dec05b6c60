"""Slot-packed multi-head attention Pallas kernel (natural-layout, all heads
in one GEMM pair).

Motivation (measured on v5e): per-head attention dots for this model's
geometry (L ∈ {37, 145}, head_dim ∈ {24, 32}) execute at the single-MXU
small-matmul rate (~125 ns per 128³ pass) — both XLA's batched matmul and a
per-head Pallas loop sit at that floor (~60 µs/image of passes), while LARGE
matmuls on the same chip run ~6× faster through MXU-internal parallelism.

Trick: heads occupy DISJOINT feature slots of the natural (L, D = H·d)
layout, so with a block-diagonal "spread" of K/V —

    Ks[g·Lb + m, c] = k[m, c] if c ∈ slot(g) else 0        (Lb = L padded to 128)

a SINGLE dot  S = (Q·scale) @ Ksᵀ  of shape (L, D)×(D, H·Lb) yields every
head's score block at S[:, g·Lb : g·Lb+L] with cross-head terms EXACTLY zero
(disjoint slots), and a single  O = P @ Vs  returns the heads already
concatenated in natural layout. Queries stay packed (no spread needed), the
softmax is segmented over 128-aligned static lane slices, and the kernel's
inputs/outputs are the raw qkv-GEMM slices — no (B, H, L, d) transposes
anywhere. The backward kernel recomputes P in VMEM and collapses the spread
gradients back through the same slot masks.

All score math is fp32; IO is bf16 or fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG = -1e30


def _lb(L: int) -> int:
    return -(-L // _LANE) * _LANE


def supported(B: int, H: int, L: int, D: int, dtype_name: str) -> bool:
    if dtype_name not in ("bfloat16", "float32"):
        return False
    if D % H or L > 1024:
        return False
    n_span = H * _lb(L)
    # VMEM estimate (bwd, the larger kernel): Ks/Vs + S/P/dP fp32 + spread grads
    vmem = 2 * n_span * D * 2 + 3 * _lb(L) * n_span * 4 + 2 * n_span * D * 4
    return vmem < 100 * 1024 * 1024 // 8  # ~12.5 MB budget


def _slot_masks(H: int, d: int, D: int, L: int, dtype):
    """(H, 1, D) one-hot-per-slot lane masks."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    return [(col // d == g).astype(dtype) for g in range(H)]


def _spread(x, H: int, d: int, Lb: int, scratch_ref, masks):
    """Write (L, D) rows into block-diagonal (H·Lb, D) scratch (slot-masked)."""
    L = x.shape[0]
    scratch_ref[...] = jnp.zeros_like(scratch_ref)
    for g in range(H):
        scratch_ref[pl.ds(g * Lb, L), :] = x * masks[g]


def _segmented_softmax(s, H: int, Lb: int, L: int):
    """Per-head softmax over 128-aligned lane segments; pad lanes get 0."""
    outs = []
    for g in range(H):
        sl = s[:, g * Lb : (g + 1) * Lb]
        if L < Lb:
            col = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 1)
            sl = jnp.where(col < L, sl, _NEG)
        m = jnp.max(sl, axis=-1, keepdims=True)
        p = jnp.exp(sl - m)
        outs.append(p / jnp.sum(p, axis=-1, keepdims=True))
    return jnp.concatenate(outs, axis=-1)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, ks_ref, vs_ref, *, H, d, L, scale):
    D = H * d
    Lb = _lb(L)
    masks = _slot_masks(H, d, D, L, k_ref.dtype)
    _spread(k_ref[0], H, d, Lb, ks_ref, masks)
    _spread(v_ref[0], H, d, Lb, vs_ref, masks)
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    s = jax.lax.dot_general(
        q, ks_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = _segmented_softmax(s, H, Lb, L).astype(q_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, vs_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _collapse(spread_grad, H: int, d: int, Lb: int, L: int, masks):
    """(H·Lb, D) spread gradient → (L, D) by slot-masked block-row sum."""
    out = None
    for g in range(H):
        part = spread_grad[g * Lb : g * Lb + L, :] * masks[g]
        out = part if out is None else out + part
    return out


def _bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, ks_ref, vs_ref,
    *, H, d, L, scale,
):
    D = H * d
    Lb = _lb(L)
    masks = _slot_masks(H, d, D, L, k_ref.dtype)
    masks_f = [m.astype(jnp.float32) for m in masks]
    _spread(k_ref[0], H, d, Lb, ks_ref, masks)
    _spread(v_ref[0], H, d, Lb, vs_ref, masks)
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    g = g_ref[0]
    s = jax.lax.dot_general(
        q, ks_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = _segmented_softmax(s, H, Lb, L)  # (L, H·Lb) fp32
    pb = p.astype(q_ref.dtype)
    # dVs = Pᵀ G → (H·Lb, D); collapse slots → dv
    dvs = jax.lax.dot_general(
        pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_ref[0] = _collapse(dvs, H, d, Lb, L, masks_f).astype(dv_ref.dtype)
    # dP = G Vsᵀ → (L, H·Lb)
    dp = jax.lax.dot_general(
        g, vs_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # segmented dS = P ∘ (dP − seg-rowsum(dP ∘ P))
    ds_parts = []
    for gi in range(H):
        sl = slice(gi * Lb, (gi + 1) * Lb)
        pg, dpg = p[:, sl], dp[:, sl]
        ds_parts.append(pg * (dpg - jnp.sum(dpg * pg, axis=-1, keepdims=True)))
    ds = jnp.concatenate(ds_parts, axis=-1).astype(q_ref.dtype)
    # dQ = scale · dS Ks  → natural layout directly
    dq_ref[0] = (
        jax.lax.dot_general(
            ds, ks_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    ).astype(dq_ref.dtype)
    # dKs = dSᵀ (Q·scale) → collapse slots → dk
    dks = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_ref[0] = _collapse(dks, H, d, Lb, L, masks_f).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mha_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int):
    """Fused all-head attention on natural layout: (B, L, D) → (B, L, D)."""
    return _fwd(q, k, v, num_heads)[0]


def _fwd(q, k, v, H):
    B, L, D = q.shape
    d = D // H
    Lb = _lb(L)
    scale = 1.0 / (d**0.5)
    spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, d=d, L=L, scale=scale),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H * Lb, D), q.dtype),
            pltpu.VMEM((H * Lb, D), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L * Lb * H * D,
            bytes_accessed=4 * B * L * D * q.dtype.itemsize,
            transcendentals=B * L * Lb * H,
        ),
    )(q, k, v)
    return out, (q, k, v)


def _bwd(H, res, g):
    q, k, v = res
    B, L, D = q.shape
    d = D // H
    Lb = _lb(L)
    scale = 1.0 / (d**0.5)
    spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, L, D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, d=d, L=L, scale=scale),
        grid=(B,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        scratch_shapes=[
            pltpu.VMEM((H * Lb, D), q.dtype),
            pltpu.VMEM((H * Lb, D), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=11 * B * L * Lb * H * D,
            bytes_accessed=7 * B * L * D * q.dtype.itemsize,
            transcendentals=B * L * Lb * H,
        ),
    )(q, k, v, g)
    return dq, dk, dv


mha_packed.defvjp(_fwd, _bwd)
