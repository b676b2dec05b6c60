"""Head-stacked multi-head attention Pallas kernel (natural layout, minimal
MXU passes).

Refinement of the slot-packed kernel (``attention_pallas_packed``): instead
of spreading K/V into a block-diagonal (H·Lb, D) with per-head 128-aligned
segments (which pads the score N-dim to H·Lb and needs a segmented softmax),
stack the QUERIES per head along the M-dim with disjoint-slot masking and
keep K/V in their natural (L, D) layout:

    Qs[g·L + l, c] = q[l, c]·scale  if c ∈ slot(g) else 0
    S  = Qs Kᵀ               (H·L, L)   — S[(g,l), m] = q_g[l]·k_g[m] exactly
                                          (disjoint slots kill cross terms)
    P  = row-softmax(S)                  — no segmentation needed
    O* = P V                 (H·L, D)
    o[l, c] = O*[slot(c)·L + l, c]       — slot-masked row-block collapse

MXU passes per image drop ~1.7× (decoder) / 3× (encoder) vs the N-packed
form, the scores tensor shrinks from (L, H·Lb) to (H·L, L), and the backward
gets dV and dK directly (no collapse):

    dP = dOs Vᵀ ; dS = P∘(dP − rowsum(dP∘P))
    dQs = dS K  → slot-collapse → dq
    dV  = Pᵀ dOs                 (direct)
    dK  = dSᵀ Qs                 (direct)

where dOs is dO spread like Q. fp32 scores/softmax; bf16/fp32 IO.

Round-2 refinements (measured at B=384 on v5e, docs/PERFORMANCE.md):
- multi-image grid steps: each grid iteration processes G images (default 4)
  to amortize per-iteration overhead — full-step 20.5 → 19.1 ms;
- fused-qkv entry point ``mha_stacked_qkv``: consumes the (B, L, 3D) qkv
  GEMM output directly and returns a single (B, L, 3D) gradient, removing
  the q/k/v slice + concat relayout copies XLA inserted at the custom-call
  boundary — full-step 18.95 → 18.15 ms. The three-input ``mha_stacked``
  remains for natural-layout callers (JEPA predictor, tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(B: int, H: int, L: int, D: int, dtype_name: str) -> bool:
    if dtype_name not in ("bfloat16", "float32"):
        return False
    if D % H or L > 1024 or H * L > 4096:
        return False
    # VMEM (bwd): Qs/dOs/dQs (H·L, D) + S/P/dP (H·L, L) fp32 + IO blocks
    Lp = -(-L // 128) * 128
    vmem = 3 * H * L * D * 4 + 3 * H * L * Lp * 4
    return vmem < 11 * 1024 * 1024


def _masks(H: int, d: int, D: int, dtype):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    return [(col // d == g).astype(dtype) for g in range(H)]


def _head_groups(H: int, d: int, D: int):
    """Contiguous head ranges whose slots fit one 128-lane tile each.

    The head-stacked score GEMM contracts over the FULL D even though each
    row's query is nonzero only in its d-wide slot — at D=192 that is 2 MXU
    K-passes where the useful work needs 1. When the slot layout allows it
    (every group's column span [c0, c1) starts 128-aligned and is ≤128
    wide), splitting the S/PV/dV/dQs/dK GEMMs per head GROUP halves the
    K-passes (and the PV/dK N-passes) on the D=192 decoder: per image fwd
    28 → 16 MXU tile-passes for S and for PV. Returns ``[(h0, h1, c0, c1),
    …]`` or ``None`` when no multi-group split exists (D ≤ 128 — already
    one tile; or a slot crosses a tile boundary, e.g. the D=144/d=24
    encoder where head 5 spans cols 120..144)."""
    if D <= 128:
        return None
    groups = []
    h0 = 0
    while h0 < H:
        c0 = h0 * d
        if c0 % 128:
            return None
        h1 = h0
        while h1 < H and (h1 + 1) * d <= c0 + 128:
            h1 += 1
        if h1 == h0:
            return None
        groups.append((h0, h1, c0, h1 * d))
        h0 = h1
    return groups if len(groups) > 1 else None


def _head_groups_any(H: int, d: int, D: int):
    """Greedy head grouping with spans ≤128 wide at ANY column offset.

    Covers geometries the tile-aligned policy rejects — the D=144/d=24
    encoder becomes ``[(0, 5, 0, 120), (5, 6, 120, 144)]``: group spans of
    120 and 24 columns each pad to ONE 128-lane tile, so the S/PV/dV/dQs/
    dK contractions drop from 2 K-tiles (D=144→256) to 1 per head block.
    The correctness argument is identical to the aligned split (each
    group's slots lie inside its span; everything outside is exact zeros),
    but the unaligned VMEM value-slices are a different Mosaic lowering
    configuration — the historical fault class involved non-tile-offset
    lane slices — hence the separate opt-in level."""
    if D <= 128:
        return None
    groups = []
    h0 = 0
    while h0 < H:
        c0 = h0 * d
        h1 = h0
        while h1 < H and (h1 + 1) * d <= c0 + 128:
            h1 += 1
        if h1 == h0:
            return None  # a single slot wider than one tile — no split
        groups.append((h0, h1, c0, h1 * d))
        h0 = h1
    return groups if len(groups) > 1 else None


def _grouped(H: int, d: int, D: int):
    """Head-group split — ON by default (level 2) since round 5.

    Hardware-validated on v5e (outputs/hw/watch/results.log 2026-08-19):
    grouped2 MAE 29,211 img/s (2.455x baseline) vs 28,362 ungrouped,
    classifier 25,887 vs 25,335, all fwd+bwd smokes OK at B=64/2000 for
    the D=144 encoder and D=192 decoder geometries. ``SSRL_ATTN_GROUPED``
    is now the OFF-switch / level selector: ``0`` disables the split
    entirely, ``1`` allows tile-ALIGNED groups only (the D=192 decoder),
    ``2`` (default) also takes any-offset spans ≤128 wide (activates the
    D=144 encoder). Interpret-mode parity is in tests/test_attention.py;
    the hardware smoke covers every level in its own section."""
    import os

    flag = os.environ.get("SSRL_ATTN_GROUPED", "2")
    if flag not in ("1", "2"):
        return None
    groups = _head_groups(H, d, D)
    if groups is None and flag == "2":
        groups = _head_groups_any(H, d, D)
    return groups


def _spread_rows(x, masks):
    """(L, D) → (H·L, D): row block g = x ∘ mask_g."""
    return jnp.concatenate([x * m for m in masks], axis=0)


def _collapse_rows(xs, L, masks):
    """(H·L, D) → (L, D): Σ_g block_g ∘ mask_g."""
    out = None
    for g, m in enumerate(masks):
        part = xs[g * L : (g + 1) * L, :] * m
        out = part if out is None else out + part
    return out


def _softmax_rows(s):
    # fp32 row softmax. Measured-and-rejected variants (v5e, B=384, in-situ):
    # bf16 exp/normalize 22.3 ms/step vs 21.7 fp32 (conversion overhead);
    # reciprocal-multiply normalize: neutral (docs/PERFORMANCE.md).
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _attn_fwd_one(q_raw, k, v, *, masks, masks_f, scale, L, groups=None):
    """One image: natural-layout (L, D) q/k/v → (L, D) output.

    ``groups``: optional head-group split (``_head_groups``) — identical
    math per group restricted to its 128-lane column span; the cross-slot
    products the full-width GEMM computes are exact zeros, so dropping
    them changes nothing numerically."""
    q = (q_raw.astype(jnp.float32) * scale).astype(q_raw.dtype)
    if groups is None:
        qs = _spread_rows(q, masks)  # (H·L, D)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (H·L, L)
        p = _softmax_rows(s).astype(q_raw.dtype)
        o_st = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.float32)  # (H·L, D)
        return _collapse_rows(o_st, L, masks_f)
    out_blocks = []
    for h0, h1, c0, c1 in groups:
        qs_g = jnp.concatenate(
            [(q * masks[g])[:, c0:c1] for g in range(h0, h1)], axis=0
        )  # ((h1-h0)·L, c1-c0)
        s = jax.lax.dot_general(
            qs_g, k[:, c0:c1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = _softmax_rows(s).astype(q_raw.dtype)
        o = jax.lax.dot_general(
            p, v[:, c0:c1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        blk = None
        for j, g in enumerate(range(h0, h1)):
            part = o[j * L : (j + 1) * L, :] * masks_f[g][:, c0:c1]
            blk = part if blk is None else blk + part
        out_blocks.append(blk)
    return jnp.concatenate(out_blocks, axis=1)


def _attn_bwd_one(q_raw, k, v, do, *, masks, masks_f, scale, L, groups=None):
    """One image: → (dq, dk, dv), all (L, D) fp32.

    ``groups`` as in ``_attn_fwd_one``: every GEMM restricts to the group's
    column span — cross-slot contributions are exact zeros in the
    full-width form, so the split is numerically identical."""
    q = (q_raw.astype(jnp.float32) * scale).astype(q_raw.dtype)
    if groups is None:
        qs = _spread_rows(q, masks)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = _softmax_rows(s)  # (H·L, L) fp32
        pb = p.astype(q_raw.dtype)
        dos = _spread_rows(do, masks)  # (H·L, D)
        # dV = Pᵀ dOs — direct natural layout
        dv = jax.lax.dot_general(
            pb, dos, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dP = dOs Vᵀ ; dS = P ∘ (dP − rowsum(dP ∘ P))
        dp = jax.lax.dot_general(
            dos, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q_raw.dtype)
        # dQs = dS K → collapse → dq (scale folded back)
        dqs = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq = _collapse_rows(dqs, L, masks_f) * scale
        # dK = dSᵀ Qs — direct
        dk = jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dq, dk, dv
    dq_blocks, dk_blocks, dv_blocks = [], [], []
    for h0, h1, c0, c1 in groups:
        qs_g = jnp.concatenate(
            [(q * masks[g])[:, c0:c1] for g in range(h0, h1)], axis=0
        )
        s = jax.lax.dot_general(
            qs_g, k[:, c0:c1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = _softmax_rows(s)
        pb = p.astype(q_raw.dtype)
        dos_g = jnp.concatenate(
            [(do * masks[g])[:, c0:c1] for g in range(h0, h1)], axis=0
        )
        dv_blocks.append(jax.lax.dot_general(
            pb, dos_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dp = jax.lax.dot_general(
            dos_g, v[:, c0:c1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(
            q_raw.dtype)
        dqs = jax.lax.dot_general(
            ds, k[:, c0:c1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        blk = None
        for j, g in enumerate(range(h0, h1)):
            part = dqs[j * L : (j + 1) * L, :] * masks_f[g][:, c0:c1]
            blk = part if blk is None else blk + part
        dq_blocks.append(blk * scale)
        dk_blocks.append(jax.lax.dot_general(
            ds, qs_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    dq = jnp.concatenate(dq_blocks, axis=1)
    dk = jnp.concatenate(dk_blocks, axis=1)
    dv = jnp.concatenate(dv_blocks, axis=1)
    return dq, dk, dv


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, H, d, L, scale, G):
    D = H * d
    masks = _masks(H, d, D, q_ref.dtype)
    masks_f = [m.astype(jnp.float32) for m in masks]
    groups = _grouped(H, d, D)
    for g in range(G):  # images per grid step (amortizes grid overhead)
        o_ref[g] = _attn_fwd_one(
            q_ref[g], k_ref[g], v_ref[g],
            masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, H, d, L, scale, G):
    D = H * d
    masks = _masks(H, d, D, q_ref.dtype)
    masks_f = [m.astype(jnp.float32) for m in masks]
    groups = _grouped(H, d, D)
    for g in range(G):
        dq, dk, dv = _attn_bwd_one(
            q_ref[g], k_ref[g], v_ref[g], g_ref[g],
            masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
        )
        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _fwd_qkv_kernel(qkv_ref, o_ref, *, H, d, L, scale, G):
    D = H * d
    masks = _masks(H, d, D, qkv_ref.dtype)
    masks_f = [m.astype(jnp.float32) for m in masks]
    groups = _grouped(H, d, D)
    for g in range(G):
        x = qkv_ref[g]  # (L, 3D) — fused [q | k | v] straight from the GEMM
        o_ref[g] = _attn_fwd_one(
            x[:, :D], x[:, D : 2 * D], x[:, 2 * D :],
            masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
        ).astype(o_ref.dtype)


def _bwd_qkv_kernel(qkv_ref, g_ref, dqkv_ref, *, H, d, L, scale, G):
    D = H * d
    masks = _masks(H, d, D, qkv_ref.dtype)
    masks_f = [m.astype(jnp.float32) for m in masks]
    groups = _grouped(H, d, D)
    for g in range(G):
        x = qkv_ref[g]
        dq, dk, dv = _attn_bwd_one(
            x[:, :D], x[:, D : 2 * D], x[:, 2 * D :], g_ref[g],
            masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
        )
        dqkv_ref[g] = jnp.concatenate([dq, dk, dv], axis=-1).astype(dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mha_stacked(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int):
    """Head-stacked fused attention: (B, L, D) → (B, L, D) natural layout."""
    return _fwd(q, k, v, num_heads)[0]


def _specs(G, L, D):
    return pl.BlockSpec((G, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _group(B: int, D: int = 128, env_var: str = "SSRL_ATTN_GROUP") -> int:
    """Images per grid step (amortizes per-grid-step overhead).

    Measured on v5e at B=384 (full MAE step): G=1 20.5 ms, G=2 19.1 ms,
    G=4 19.1 ms; G=8 blows up Mosaic compile time (unrolled body). Default
    4, overridable via ``SSRL_ATTN_GROUP`` for ablation.

    Sub-lane-tile dims (D < 128) are pinned to G=1: multi-image grid steps
    at e.g. (L=145, D=96, d=16) HARD-FAULT the v5e worker at large batch
    (measured: B=2000/G=4 crashes, B<=768/G=4 and B=2000/G=1 run clean) —
    G=1 is the round-1 configuration hardware-proven at B=2048.
    """
    import os

    if D < 128:
        return 1
    override = os.environ.get(env_var)
    if override:
        g = int(override)
        # invalid override (non-dividing G would silently drop the batch
        # tail via grid=B//G): ignore and fall back to the auto choice —
        # consistent with block_pallas._group/_flat_group
        if g > 0 and B % g == 0:
            return g
    for g in (4, 2):
        if B % g == 0:
            return g
    return 1


def _fwd(q, k, v, H):
    B, L, D = q.shape
    d = D // H
    scale = 1.0 / (d**0.5)
    G = _group(B, D)
    spec = _specs(G, L, D)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, d=d, L=L, scale=scale, G=G),
        grid=(B // G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * d,
            bytes_accessed=4 * B * L * D * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(q, k, v)
    return out, (q, k, v)


def _bwd(H, res, g):
    q, k, v = res
    B, L, D = q.shape
    d = D // H
    scale = 1.0 / (d**0.5)
    G = _group(B, D)
    spec = _specs(G, L, D)
    shape = jax.ShapeDtypeStruct((B, L, D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, d=d, L=L, scale=scale, G=G),
        grid=(B // G,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=11 * B * H * L * L * d,
            bytes_accessed=7 * B * L * D * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(q, k, v, g)
    return dq, dk, dv


mha_stacked.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def mha_stacked_qkv(qkv: jnp.ndarray, num_heads: int):
    """Head-stacked attention on the FUSED (B, L, 3·D) qkv tensor.

    Takes the qkv projection's output directly — [q | k | v] along features —
    and returns (B, L, D). One custom-call input instead of three slices and
    one gradient output instead of a three-way concat: at B=384 this removes
    the (B, L, 3D) relayout copies XLA otherwise inserts around the kernel
    boundary on both passes (~0.7 ms/step; docs/PERFORMANCE.md).
    """
    return _fwd_qkv(qkv, num_heads)[0]


def _fwd_qkv(qkv, H):
    B, L, D3 = qkv.shape
    D = D3 // 3
    d = D // H
    scale = 1.0 / (d**0.5)
    G = _group(B, D)
    out = pl.pallas_call(
        functools.partial(_fwd_qkv_kernel, H=H, d=d, L=L, scale=scale, G=G),
        grid=(B // G,),
        in_specs=[_specs(G, L, D3)],
        out_specs=_specs(G, L, D),
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * d,
            bytes_accessed=4 * B * L * D * qkv.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(qkv)
    return out, qkv


def _bwd_qkv(H, qkv, g):
    B, L, D3 = qkv.shape
    D = D3 // 3
    d = D // H
    scale = 1.0 / (d**0.5)
    G = _group(B, D)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_qkv_kernel, H=H, d=d, L=L, scale=scale, G=G),
        grid=(B // G,),
        in_specs=[_specs(G, L, D3), _specs(G, L, D)],
        out_specs=_specs(G, L, D3),
        out_shape=jax.ShapeDtypeStruct((B, L, D3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=11 * B * H * L * L * d,
            bytes_accessed=7 * B * L * D * qkv.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(qkv, g)
    return (dqkv,)


mha_stacked_qkv.defvjp(_fwd_qkv, _bwd_qkv)
