"""Fused patch-embed prologue: embed GEMM + CLS + pos-embed + mask gather
in ONE Pallas kernel.

Reference behavior being fused (``src/models/mae.py:85`` via lightly
``MaskedVisionTransformerTIMM.encode`` / timm ``PatchEmbed``): patches are
linearly embedded, a CLS token is prepended, the learned positional
embedding is added over the FULL (1 + N)-token sequence, and then (MAE
pretrain path) only the ``idx_keep`` tokens are gathered for the encoder
blocks. In the torch reference every arrow is its own HBM round trip; here
the round-3 profile attributes ~1 ms of the 27.2 ms MAE step to these
prologue fusions/copies (docs/PERFORMANCE.md round-3 tail), so the whole
chain runs per-image in VMEM and only the (B, K, D) kept tokens ever reach
HBM:

    out[g] = onehot(idx_keep[g]) @ (concat([cls, patches[g] @ W + b]) + pos)

The gather is the same one-hot MXU contraction as ``ops.masking
.get_at_index_mm`` (exact 0/1 selector; the backward is its transpose — an
MXU scatter-add). The custom VJP accumulates dW/db/d(cls,pos) in fp32
across the grid (same scheme as ``ops.block_pallas``) and emits per-image
``dpatches`` so the augmentation pipeline upstream stays differentiable.

Hard-fault hygiene (CLAUDE.md: lane dims < 128 can hard-fault the TPU
worker): ``idx_keep`` is lane-padded to a multiple of 128 with the
out-of-range sentinel ``L`` OUTSIDE the kernel, so every HBM→VMEM block has
≥128 lanes; the in-kernel selector keeps the padded rows (their one-hot is
all-zero) and the output is value-sliced back to K rows — value slices at
odd sizes are the proven pattern from the block kernels (L=145 rows, D=144
lane slices). The padded (B, Kp) indices are additionally reshaped to
(B//G, G, Kp) with block (1, G, Kp): Mosaic requires a block's last TWO
dims to be (8, 128)-divisible or full-sized, and the 2-D (G, Kp) block at
G=2 violated that (the round-4 hardware lowering failure); leading with the
grid-blocked dim makes both trailing dims full.

Gated OFF by default behind ``SSRL_FUSED_EMBED=1`` until hardware-measured:
interpret-mode parity lives in tests/test_embed_pallas.py, the hardware
smoke covers the production geometries, and the keep/reject verdict goes to
docs/PERFORMANCE.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssrl_vit_mae_jepa_tpu.ops.block_pallas import (
    _COMPILER_PARAMS,
    _dot,
    _dot_nt,
    _dot_tn,
    _full_spec,
    _group,
)


def fused_embed_enabled() -> bool:
    return os.environ.get("SSRL_FUSED_EMBED", "0") == "1"


def embed_supported(B: int, N: int, Pc: int, D: int, K=None) -> bool:
    """Geometry guard: compute lane dims must not fall in the sub-128
    fault class, the batch must tile into groups, and one grid step's live
    set must be a small fraction of VMEM (production G=8, N=144, Pc=192,
    D=144 → ~1.7 MB)."""
    if min(Pc, D) < 128:
        return False
    G = _group(B)
    if B % G:
        return False
    L = N + 1
    Kp = L if K is None else _pad128(K)
    vmem = 4 * (G * N * Pc + 2 * G * L * D + G * Kp * D + Pc * D + L * D)
    return vmem < 8 * 1024 * 1024


def use_fused_embed(platform: str, B: int, N: int, Pc: int, D: int, K=None) -> bool:
    """Dispatch policy. ``SSRL_FUSED_EMBED=1`` enables on TPU;
    ``SSRL_FUSED_EMBED=force`` additionally skips the platform check (for
    interpret-mode parity tests on CPU)."""
    flag = os.environ.get("SSRL_FUSED_EMBED", "0")
    if flag not in ("1", "force"):
        return False
    if flag != "force" and platform not in ("tpu", "axon"):
        return False
    return embed_supported(B, N, Pc, D, K)


def _pad128(k: int) -> int:
    return -(-k // 128) * 128


def _selector(idx_row, L, cast):
    """(Kp,) int32 (sentinel L on padded lanes) → (Kp, L) 0/1 selector."""
    Kp = idx_row.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (Kp, L), 1)
    return (idx_row[:, None] == cols).astype(cast)


def _embed_one(patches_g, w, b, cls_pos, *, cast):
    """One image: (N, Pc) patches → (L, D) embedded+positioned tokens.

    ``cls_pos`` is the precomputed (L, D) fp32 tensor ``pos + [cls; 0…]`` —
    the CLS concat and the pos add collapse into one operand: row 0 is pure
    cls_pos[0], rows 1.. are emb + cls_pos[1:].
    """
    emb = (_dot(patches_g, w) + b).astype(cast)  # (N, D)
    top = cls_pos[:1].astype(cast)  # (1, D) — cls + pos[0]
    rest = emb + cls_pos[1:].astype(cast)
    return jnp.concatenate([top, rest], axis=0)  # (L, D)


def _fwd_kernel(p_ref, w_ref, b_ref, cp_ref, *rest, G, L, K):
    idx_ref, o_ref = (rest[0], rest[1]) if len(rest) == 2 else (None, rest[0])
    cast = o_ref.dtype
    w = w_ref[...].astype(cast)
    b = b_ref[...].astype(cast)
    cp = cp_ref[...]
    for g in range(G):
        full = _embed_one(p_ref[g], w, b, cp, cast=cast)
        if idx_ref is None:
            o_ref[g] = full
        else:
            # idx block is (1, G, Kp): the grid-blocked dim leads so the
            # LAST TWO dims are full-sized — Mosaic rejects a (G, Kp)
            # 2-D block when G % 8 != 0 (the round-4 lowering failure).
            sel = _selector(idx_ref[0, g], L, cast)  # (Kp, L)
            o_ref[g] = _dot(sel, full).astype(cast)[:K]


def _bwd_kernel(p_ref, w_ref, *rest, G, L, K):
    if len(rest) == 6:
        idx_ref, g_ref, dp_ref, dw_ref, db_ref, dcp_ref = rest
    else:
        idx_ref = None
        g_ref, dp_ref, dw_ref, db_ref, dcp_ref = rest
    cast = g_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dw_ref, db_ref, dcp_ref):
            r[...] = jnp.zeros_like(r)

    w = w_ref[...].astype(cast)
    for g in range(G):
        gy = g_ref[g]  # (K, D) or (L, D)
        if idx_ref is None:
            dfull = gy.astype(jnp.float32)  # (L, D)
        else:
            Kp = idx_ref.shape[-1]
            sel = _selector(idx_ref[0, g], L, cast)  # (Kp, L)
            gyp = jnp.concatenate(
                [gy, jnp.zeros((Kp - K, gy.shape[-1]), cast)], axis=0
            )
            # transpose-gather: scatter-add each dy row to its token row
            dfull = _dot_tn(sel, gyp)  # (L, D) fp32
        dcp_ref[...] += dfull
        demb = dfull[1:].astype(cast)  # (N, D)
        dw_ref[...] += _dot_tn(p_ref[g], demb)
        db_ref[...] += jnp.sum(dfull[1:], axis=0, keepdims=True)
        dp_ref[g] = _dot_nt(demb, w).astype(dp_ref.dtype)


def _pad_idx(idx_keep, L):
    """(B, K) int → (B, Kp) int32, padded with the never-matching sentinel
    ``L`` so every kernel input block has ≥128 lanes."""
    B, K = idx_keep.shape
    Kp = _pad128(K)
    pad = jnp.full((B, Kp - K), L, jnp.int32)
    return jnp.concatenate([idx_keep.astype(jnp.int32), pad], axis=-1)


def _cls_pos(cls, pos):
    """Fold the CLS token into row 0 of the positional embedding (fp32)."""
    cls2 = cls.reshape(1, -1).astype(jnp.float32)
    posf = pos.reshape(pos.shape[-2], pos.shape[-1]).astype(jnp.float32)
    return posf.at[:1].add(cls2)


def _fpe_fwd_impl(patches, w, b, cls, pos, idx_keep):
    B, N, Pc = patches.shape
    D = w.shape[-1]
    L = N + 1
    K = L if idx_keep is None else idx_keep.shape[-1]
    G = _group(B)
    assert B % G == 0, (B, G)
    cast = patches.dtype
    pspec = pl.BlockSpec((G, N, Pc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((G, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    operands = [
        patches,
        w.astype(jnp.float32),
        b.reshape(1, D).astype(jnp.float32),
        _cls_pos(cls, pos),
    ]
    in_specs = [pspec] + [_full_spec(x.shape) for x in operands[1:]]
    if idx_keep is not None:
        idxp = _pad_idx(idx_keep, L).reshape(B // G, G, -1)
        operands.append(idxp)
        in_specs.append(
            pl.BlockSpec((1, G, idxp.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, G=G, L=L, K=K),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, K, D), cast),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * Pc * D + (0 if idx_keep is None else 2 * B * K * L * D),
            bytes_accessed=B * (N * Pc + K * D) * patches.dtype.itemsize,
            transcendentals=0,
        ),
    )(*operands)


@jax.custom_vjp
def fused_patch_embed(patches, w, b, cls, pos, idx_keep):
    """(B, N, Pc) patches → (B, K, D) tokens: embed + CLS + pos + gather.

    ``w``/``b``: the ``patch_embed`` Dense params (fp32, flax layout);
    ``cls``: (1, 1, D) or (D,); ``pos``: (1, L, D) or (L, D);
    ``idx_keep``: (B, K) int or None (then K = L and no gather).
    Numerics match the unfused chain at compute-dtype rounding.
    """
    return _fpe_fwd_impl(patches, w, b, cls, pos, idx_keep)


def _fpe_vjp_fwd(patches, w, b, cls, pos, idx_keep):
    return _fpe_fwd_impl(patches, w, b, cls, pos, idx_keep), (
        patches, w, cls, pos, idx_keep,
    )


def _fpe_vjp_bwd(res, g):
    patches, w, cls, pos, idx_keep = res
    B, N, Pc = patches.shape
    D = w.shape[-1]
    L = N + 1
    K = L if idx_keep is None else idx_keep.shape[-1]
    G = _group(B)
    cast = patches.dtype
    pspec = pl.BlockSpec((G, N, Pc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((G, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    operands = [patches, w.astype(jnp.float32)]
    in_specs = [pspec, _full_spec((Pc, D))]
    if idx_keep is not None:
        idxp = _pad_idx(idx_keep, L).reshape(B // G, G, -1)
        operands.append(idxp)
        in_specs.append(
            pl.BlockSpec((1, G, idxp.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    operands.append(g.astype(cast))
    in_specs.append(gspec)
    dp, dw, db, dcp = pl.pallas_call(
        functools.partial(_bwd_kernel, G=G, L=L, K=K),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=(
            pspec,
            _full_spec((Pc, D)),
            _full_spec((1, D)),
            _full_spec((L, D)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, Pc), cast),      # dpatches
            jax.ShapeDtypeStruct((Pc, D), jnp.float32),   # dw
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # db
            jax.ShapeDtypeStruct((L, D), jnp.float32),    # d(cls_pos)
        ),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * N * Pc * D + (0 if idx_keep is None else 2 * B * K * L * D),
            bytes_accessed=2 * B * (N * Pc + K * D) * patches.dtype.itemsize,
            transcendentals=0,
        ),
    )(*operands)
    # cls rides in row 0 of cls_pos (a linear fold), pos in every row
    dcls = dcp[:1].reshape(np.shape(cls)).astype(jnp.float32)
    dpos = dcp.reshape(np.shape(pos)).astype(jnp.float32)
    didx = (
        None if idx_keep is None
        else np.zeros(idx_keep.shape, dtype=jax.dtypes.float0)
    )
    return (dp, dw, db.reshape(-1), dcls, dpos, didx)


fused_patch_embed.defvjp(_fpe_vjp_fwd, _fpe_vjp_bwd)
