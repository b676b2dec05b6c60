"""Fused multi-head attention Pallas TPU kernel (batch-blocked, full-L VMEM).

Why a custom kernel (measured on TPU v5e, flagship config, batch 4096):
XLA's einsum attention materializes the (B, H, L, L) fp32 score tensor in
HBM — ~8 GB of traffic per training step for L=145 — and ran at ~40 ms per
softmax(QKᵀ)V pair, 8× the cost of the 3×-more-FLOPs MLP. Sequences here are
tiny (37-token masked encoder, 145-token decoder/classifier — SURVEY.md
§5.7), so instead of flash-style KV tiling the kernel keeps each (L, L)
score matrix entirely in VMEM, blocks over flattened batch×head programs,
and fuses scale → softmax → PV. HBM traffic drops to the Q/K/V/O tensors
themselves.

Backward is a second fused kernel (custom VJP): it recomputes P from the
saved Q/K residuals in VMEM (cheaper than storing (B,H,L,L) probabilities)
and emits dQ/dK/dV via the standard dS = P ∘ (dP − rowsum(dP ∘ P)) identity.

Numerics: scores and the softmax run in fp32 (matching the XLA path and the
reference's autocast behavior); inputs/outputs are bf16 or fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_L = 2048
_MAX_D = 128
# v5e VMEM is 16 MB; leave headroom for Mosaic's own buffers + double
# buffering of the pipelined grid.
_VMEM_BUDGET = 10 * 1024 * 1024


def _block_n(N: int, L: int, d: int, itemsize: int, n_tensors: int):
    """Largest batch-head block whose VMEM footprint fits the budget.

    The last dim (d) is padded to 128 lanes in VMEM, L to 8 sublanes;
    footprint = n_tensors blocked tensors (×2 for pipeline double-buffering)
    + one (L, L) fp32 score matrix + softmax temporaries.
    """
    lanes = 128
    L_pad = -(-L // 8) * 8
    L_lane = -(-L // lanes) * lanes
    d_pad = -(-d // lanes) * lanes
    # fp32 (L, L) temporaries live once (fori body): s/p (+ dp/ds in bwd)
    n_score = 2 if n_tensors <= 4 else 4
    score_bytes = n_score * L_pad * L_lane * 4
    for bn in (64, 32, 16, 8, 4, 2, 1):
        if N % bn:
            continue
        tensor_bytes = 2 * n_tensors * bn * L_pad * d_pad * itemsize
        if tensor_bytes + score_bytes <= _VMEM_BUDGET:
            return bn
    return None


def supported(B: int, H: int, L: int, d: int, dtype_name: str) -> bool:
    if dtype_name not in ("bfloat16", "float32"):
        return False
    if L > _MAX_L or d > _MAX_D:
        return False
    itemsize = 2 if dtype_name == "bfloat16" else 4
    return _block_n(B * H, L, d, itemsize, 7) is not None


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


# dimension_numbers for batched (BN, L, d) attention contractions
_QKT = (((2,), (2,)), ((0,), (0,)))   # q·kᵀ over d     → (BN, L, L)
_PV = (((2,), (1,)), ((0,), (0,)))    # p·v over keys   → (BN, L, d)
_PTG = (((1,), (1,)), ((0,), (0,)))   # pᵀ·g over query → (BN, L, d)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # fori over the batch-heads of the block: Mosaic compiles ONE body and
    # loops (a batched dot_general would be fully unrolled at compile time —
    # measured 260 s compiles). DMA of the next block overlaps via the grid.
    def body(j, _):
        qj = q_ref[j]
        s = jax.lax.dot_general(
            qj, k_ref[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = _softmax_rows(s).astype(qj.dtype)
        o_ref[j] = jax.lax.dot_general(
            p, v_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    jax.lax.fori_loop(0, q_ref.shape[0], body, None)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale):
    def body(j, _):
        qj, kj, vj, gj = q_ref[j], k_ref[j], v_ref[j], g_ref[j]
        s = jax.lax.dot_general(
            qj, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = _softmax_rows(s)  # (L, L) fp32
        pb = p.astype(qj.dtype)
        # dV = Pᵀ g
        dv_ref[j] = jax.lax.dot_general(
            pb, gj, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        # dP = g Vᵀ ; dS = P ∘ (dP − rowsum(dP ∘ P))
        dp = jax.lax.dot_general(
            gj, vj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(qj.dtype)
        dq_ref[j] = (
            jax.lax.dot_general(
                ds, kj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dk_ref[j] = (
            jax.lax.dot_general(
                ds, qj, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dk_ref.dtype)

    jax.lax.fori_loop(0, q_ref.shape[0], body, None)


def _flatten(q):
    B, H, L, d = q.shape
    return q.reshape(B * H, L, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def mha_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused attention over (B, H, L, d) → (B, H, L, d)."""
    return _mha_fwd(q, k, v)[0]


def _mha_fwd(q, k, v):
    B, H, L, d = q.shape
    N = B * H
    BN = _block_n(N, L, d, q.dtype.itemsize, 4)
    scale = 1.0 / (d**0.5)
    qf, kf, vf = _flatten(q), _flatten(k), _flatten(v)
    spec = pl.BlockSpec((BN, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(N // BN,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N, L, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * L * L * d,
            bytes_accessed=4 * N * L * d * q.dtype.itemsize,
            transcendentals=N * L * L,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, L, d), (q, k, v)


def _mha_bwd(res, g):
    q, k, v = res
    B, H, L, d = q.shape
    N = B * H
    BN = _block_n(N, L, d, q.dtype.itemsize, 7)
    scale = 1.0 / (d**0.5)
    spec = pl.BlockSpec((BN, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((N, L, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(N // BN,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        cost_estimate=pl.CostEstimate(
            flops=11 * N * L * L * d,
            bytes_accessed=7 * N * L * d * q.dtype.itemsize,
            transcendentals=N * L * L,
        ),
    )(_flatten(q), _flatten(k), _flatten(v), _flatten(g))
    rs = lambda x: x.reshape(B, H, L, d)  # noqa: E731
    return rs(dq), rs(dk), rs(dv)


mha_pallas.defvjp(_mha_fwd, _mha_bwd)
