"""Fused transformer-Block Pallas kernel: the whole pre-LN block in VMEM.

The model's geometry (D=144/192, L=37/145, ~1.1M params) makes every
individual op tiny: at the throughput-optimal per-chip batch (384) the step
is bandwidth/boundary-bound, not FLOP-bound — the round-1 profile shows
~5.9 ms of small XLA fusions plus ~2.5 ms of pure layout copies per 16 ms
step, most of them at sub-layer boundaries inside the transformer blocks
(docs/PERFORMANCE.md). The TPU-first fix is to stop round-tripping HBM
between sub-layers entirely: ONE Pallas kernel computes

    y1 = LN1(x) ; qkv = y1 Wqkv + bqkv ; a = head-stacked-attention(qkv)
    x_mid = x + (a Wp + bp)
    y2 = LN2(x_mid) ; h = gelu(y2 W1 + b1) ; x_out = x_mid + (h W2 + b2)

per image group, with every intermediate VMEM-resident. The backward kernel
rematerializes the forward from (x, weights) in VMEM — flash-attention-style
remat extended to the whole block (activations never touch HBM) — and
accumulates the twelve weight gradients in fp32 across the sequential grid
(constant output block index ⇒ the accumulators live in VMEM for the whole
sweep and are written back once).

Replaces the per-sub-layer path (flax modules + ``attention_pallas_stacked``)
on TPU; that path remains as the `impl="stacked"`/CPU/parity reference. The
attention core (head-stacked Q with disjoint-slot masks, plain row softmax)
is shared with ``attention_pallas_stacked`` — see that module's docstring for
the math and its measured lineage.

Numerics: bf16 GEMMs with fp32 accumulation (``preferred_element_type``),
LayerNorm statistics/affine and softmax in fp32, exact (erf) GELU, fp32
weight-gradient accumulators — at least as precise as the flax path it
replaces (reference trains under torch bf16-mixed autocast,
``scripts/training/pretrain_mae.py:123``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import (
    _attn_bwd_one,
    _attn_fwd_one,
    _grouped,
    _masks,
)

# Scoped-VMEM ceiling per kernel invocation. The flat split-branch kernels
# hold ~17 MB of fp32 intermediates at (G*L=1160, F=768); XLA's default
# 16 MB scoped-vmem budget trips once the scheduler overlaps kernels at
# large batch (first seen at B>=1536: "Scoped allocation with size 17.05M
# and limit 16.00M"). 32 MB leaves 2x headroom inside v5e's 128 MB VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)

_EPS = 1e-6
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def supported(B: int, H: int, L: int, D: int, F: int, dtype_name: str) -> bool:
    """Shape/VMEM guard for the MONO fused-block kernel (per-image layout)."""
    if dtype_name not in ("bfloat16", "float32"):
        return False
    if D % H or L > 1024 or H * L > 4096:
        return False
    G = _group(B)
    if B % G:
        return False
    Lp = -(-L // 128) * 128
    itm = 4 * (4 * H * L * max(Lp, D) + 3 * L * F + 4 * L * 3 * D)  # fp32 live set
    weights = 2 * (3 * D * D + D * D + 2 * D * F)
    grads = 2 * weights
    blocks = 3 * G * L * D * 2
    return itm + weights + grads + blocks < 10 * 1024 * 1024


def split_supported(
    B: int, H: int, L: int, D: int, F: int, dtype_name: str,
    d_real: int | None = None,
) -> bool:
    """Shape/VMEM guard for the flat SPLIT-branch kernels.

    The flat kernels process a (G·L, D) row group per grid step with G from
    ``_flat_group`` (up to 24 for odd L) — their live set scales with G, so
    the mono ``supported()`` bound (G ≤ 2) would understate it several-fold.
    Bound here: the larger branch's fp32 live set at the actual G, compared
    against the 32 MB ``vmem_limit_bytes`` the kernels compile with (the
    measured scoped allocation at the production (G·L=1160, F=768) shape is
    17.05 MB; this formula gives 24.9 MB — conservatively high).

    ``d_real``: for the lane-padded path, heads split the REAL feature
    count while the VMEM live set scales with the padded D.
    """
    if dtype_name not in ("bfloat16", "float32"):
        return False
    dr = D if d_real is None else d_real
    if dr % H or L > 1024 or H * L > 4096:
        return False
    G = _flat_group(B, L)
    if G is None:
        return False
    Lp = -(-L // 128) * 128
    rows = G * L
    # attention branch bwd: x/gy/a/y1/dx (≈5·D) + qkv/dqkv (6·D) per row,
    # plus the per-image stacked-attention intermediates; mlp branch bwd:
    # ≈5·D + 4·F per row. All fp32-equivalent (worst case).
    attn_rows = rows * 11 * D + 4 * H * L * max(Lp, D)
    mlp_rows = rows * (5 * D + 4 * F)
    itm = 4 * max(attn_rows, mlp_rows)
    weights = 2 * (3 * D * D + D * D + 2 * D * F)
    grads = 2 * weights
    return itm + weights + grads < 30 * 1024 * 1024


def _group(B: int, env_var: str = "SSRL_BLOCK_GROUP") -> int:
    override = os.environ.get(env_var)
    if override:
        g = int(override)
        # invalid override (non-dividing G would silently drop the batch
        # tail via grid=B//G): ignore and fall back to the auto choice —
        # consistent with _flat_group's handling
        if g > 0 and B % g == 0:
            return g
    for g in (2,):
        if B % g == 0:
            return g
    return 1


def _flat_group(B: int, L: int) -> int | None:
    """Images per grid step for the flat (G·L, D) split kernels.

    Mosaic requires the block's sublane dim (G·L) divisible by 8 (or equal to
    the full array), so odd L forces G ∈ {8, 16, …}. Falls back to the whole
    batch in one grid step for small problems, else None (unsupported).
    Invalid ``SSRL_BLOCK_GROUP`` overrides are ignored (auto choice), same
    as ``_group``.
    """
    override = os.environ.get("SSRL_BLOCK_GROUP")
    if override:
        g = int(override)
        if g > 0 and B % g == 0 and (g * L) % 8 == 0:
            return g
    for g in (8, 16, 24, 4, 2, 1):
        if B % g == 0 and (g * L) % 8 == 0 and g != B:
            return g
    if B * L <= 4096:
        return B  # single grid step; block == full array is always legal
    return None


def _ln_fwd(x, s, b, n=None):
    """fp32 LayerNorm. x (L, D) any dtype; s/b (1, D) fp32 → (y_f32, xhat, inv).

    ``n``: real feature count for lane-padded rows (cols ≥ n are exact
    zeros and s/b are zero there). Statistics then come from raw sums —
    the zero pad cols contribute nothing — divided by n; the pad cols of
    xhat are nonzero (−mu·inv) but zero scale/bias keep y zero there.
    """
    xf = x.astype(jnp.float32)
    if n is None:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    else:
        D = xf.shape[-1]
        mu = jnp.sum(xf, axis=-1, keepdims=True) * (1.0 / n)
        xc = xf - mu
        # two-pass variance (the one-pass E[x²]−mu² form cancels
        # catastrophically for near-constant rows with |mu| ≳ 3, where the
        # fp32 error exceeds var+eps and rsqrt goes NaN). The pad cols'
        # xc is −mu, not 0 — mask them out of the sum of squares so the
        # variance is a true sum of squared deviations (never negative)
        real = (
            jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) < n
        ).astype(jnp.float32)
        var = jnp.sum(xc * xc * real, axis=-1, keepdims=True) * (1.0 / n)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = xc * inv
    return xhat * s + b, xhat, inv


def _ln_bwd(dy, xhat, inv, s, n=None):
    """dy (L, D) fp32 → (dx fp32, dscale (1, D), dbias (1, D)).

    ``n`` as in ``_ln_fwd``: with zero-padded s, g0 = dy·s is zero in the
    pad cols, so the raw sums see only real features; dx pad cols carry
    garbage that the caller's slice discards.
    """
    g0 = dy * s
    if n is None:
        m1 = jnp.mean(g0, axis=-1, keepdims=True)
        m2 = jnp.mean(g0 * xhat, axis=-1, keepdims=True)
    else:
        m1 = jnp.sum(g0, axis=-1, keepdims=True) * (1.0 / n)
        m2 = jnp.sum(g0 * xhat, axis=-1, keepdims=True) * (1.0 / n)
    dx = (g0 - m1 - xhat * m2) * inv
    ds = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    return dx, ds, db


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7, fp32).

    Mosaic has no ``erf`` lowering; this rational approximation is exact to
    well below bf16 resolution, so the kernel's GELU matches flax's
    ``approximate=False`` GELU at model precision.
    """
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _gelu_fwd(z):
    """Exact (erf) GELU on fp32 z."""
    return 0.5 * z * (1.0 + _erf(z * _INV_SQRT2))


def _gelu_vjp(z):
    """gelu'(z) = Φ(z) + z·φ(z), fp32."""
    phi_c = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
    return phi_c + z * pdf


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_tn(a, b):
    """aᵀ b with fp32 accumulation: (L, M)ᵀ (L, N) → (M, N)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nt(a, b):
    """a bᵀ with fp32 accumulation: (L, N) (M, N)ᵀ → (L, M)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _block_fwd_one(x, w, *, masks, masks_f, scale, L, cast, groups=None):
    """One image forward. x (L, D) bf16 → (x_out, intermediates for bwd)."""
    (s1, b1, wqkv, bqkv, wp, bp, s2, b2, w1, b1f, w2, b2f) = w
    y1_f, xhat1, inv1 = _ln_fwd(x, s1, b1)
    y1 = y1_f.astype(cast)
    qkv = (_dot(y1, wqkv) + bqkv).astype(cast)  # (L, 3D)
    D = x.shape[-1]
    a = _attn_fwd_one(
        qkv[:, :D], qkv[:, D : 2 * D], qkv[:, 2 * D :],
        masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
    ).astype(cast)  # (L, D)
    p = (_dot(a, wp) + bp).astype(cast)
    x_mid = x + p
    y2_f, xhat2, inv2 = _ln_fwd(x_mid, s2, b2)
    y2 = y2_f.astype(cast)
    z = _dot(y2, w1) + b1f  # (L, F) fp32
    h = _gelu_fwd(z).astype(cast)
    m = (_dot(h, w2) + b2f).astype(cast)
    x_out = x_mid + m
    return x_out, (y1, qkv, a, x_mid, y2, z, h, xhat1, inv1, xhat2, inv2)


def _block_bwd_one(x, w, dy, *, masks, masks_f, scale, L, cast, groups=None):
    """One image backward via full in-VMEM recompute.

    Returns (dx bf16, twelve fp32 weight grads in parameter order).
    """
    (s1, b1, wqkv, bqkv, wp, bp, s2, b2, w1, b1f, w2, b2f) = w
    _, (y1, qkv, a, x_mid, y2, z, h, xhat1, inv1, xhat2, inv2) = _block_fwd_one(
        x, w, masks=masks, masks_f=masks_f, scale=scale, L=L, cast=cast,
        groups=groups,
    )
    g = dy.astype(cast)
    # MLP branch: x_out = x_mid + gelu(LN2(x_mid) W1 + b1) W2 + b2
    dw2 = _dot_tn(h, g)
    db2f = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    dh = _dot_nt(g, w2)  # (L, F) fp32
    dz = dh * _gelu_vjp(z)
    dzc = dz.astype(cast)
    dw1 = _dot_tn(y2, dzc)
    db1f = jnp.sum(dz, axis=0, keepdims=True)
    dy2 = _dot_nt(dzc, w1)  # (L, D) fp32
    dx_mid_ln, ds2, db2 = _ln_bwd(dy2, xhat2, inv2, s2)
    dx_mid = g.astype(jnp.float32) + dx_mid_ln  # residual + LN2 path, fp32
    # Attention branch: x_mid = x + (attn(LN1(x) Wqkv + bqkv) Wp + bp)
    dp = dx_mid.astype(cast)
    dwp = _dot_tn(a, dp)
    dbp = jnp.sum(dx_mid, axis=0, keepdims=True)
    da = _dot_nt(dp, wp).astype(cast)  # (L, D)
    D = x.shape[-1]
    dq, dk, dv = _attn_bwd_one(
        qkv[:, :D], qkv[:, D : 2 * D], qkv[:, 2 * D :], da,
        masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
    )
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)  # (L, 3D) fp32
    dqkvc = dqkv.astype(cast)
    dwqkv = _dot_tn(y1, dqkvc)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dy1 = _dot_nt(dqkvc, wqkv)  # (L, D) fp32
    dx_ln, ds1, db1 = _ln_bwd(dy1, xhat1, inv1, s1)
    dx = (dx_mid + dx_ln).astype(x.dtype)
    return dx, (ds1, db1, dwqkv, dbqkv, dwp, dbp, ds2, db2, dw1, db1f, dw2, db2f)


_W_NAMES = (
    "ln1_scale", "ln1_bias", "wqkv", "bqkv", "wproj", "bproj",
    "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2",
)


def _fwd_kernel(x_ref, *rest, H, d, L, scale, G):
    w_refs, (o_ref,) = rest[:12], rest[12:]
    D = H * d
    cast = x_ref.dtype
    masks = _masks(H, d, D, cast)
    masks_f = [m.astype(jnp.float32) for m in masks]
    w = tuple(r[...] for r in w_refs)
    groups = _grouped(H, d, D)
    for g in range(G):
        x_out, _ = _block_fwd_one(
            x_ref[g], w, masks=masks, masks_f=masks_f, scale=scale, L=L,
            cast=cast, groups=groups,
        )
        o_ref[g] = x_out.astype(o_ref.dtype)


def _bwd_kernel(x_ref, *rest, H, d, L, scale, G):
    w_refs = rest[:12]
    dy_ref = rest[12]
    dx_ref = rest[13]
    grad_refs = rest[14:]
    D = H * d
    cast = x_ref.dtype
    masks = _masks(H, d, D, cast)
    masks_f = [m.astype(jnp.float32) for m in masks]
    w = tuple(r[...] for r in w_refs)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    acc = None
    groups = _grouped(H, d, D)
    for g in range(G):
        dx, grads = _block_bwd_one(
            x_ref[g], w, dy_ref[g],
            masks=masks, masks_f=masks_f, scale=scale, L=L, cast=cast,
            groups=groups,
        )
        dx_ref[g] = dx.astype(dx_ref.dtype)
        acc = grads if acc is None else tuple(a + gr for a, gr in zip(acc, grads))
    for r, gr in zip(grad_refs, acc):
        r[...] += gr


def _as2d(v):
    return v.reshape(1, -1) if v.ndim == 1 else v


def _prep(params, cast):
    """Reference-shaped fp32 params → kernel layouts (LN fp32, GEMM cast)."""
    s1, b1, wqkv, bqkv, wp, bp, s2, b2, w1, b1f, w2, b2f = params
    return (
        _as2d(s1).astype(jnp.float32), _as2d(b1).astype(jnp.float32),
        wqkv.astype(cast), _as2d(bqkv).astype(cast),
        wp.astype(cast), _as2d(bp).astype(cast),
        _as2d(s2).astype(jnp.float32), _as2d(b2).astype(jnp.float32),
        w1.astype(cast), _as2d(b1f).astype(cast),
        w2.astype(cast), _as2d(b2f).astype(cast),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def fused_block(
    x, ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2, num_heads,
):
    """Whole pre-LN transformer block as one Pallas kernel.

    ``x`` (B, L, D) bf16/fp32; weights in flax layouts (fp32, vectors 1-D).
    Matches ``models.vit.Block`` (timm block contract, SURVEY.md §2.2).
    """
    params = (ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj,
              ln2_scale, ln2_bias, w1, b1, w2, b2)
    return _fb_fwd_impl(x, params, num_heads)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _fb_fwd_impl(x, params, H):
    B, L, D = x.shape
    d = D // H
    F = params[8].shape[-1]
    scale = 1.0 / (d**0.5)
    G = _group(B)
    assert B % G == 0, (B, G)
    kp = _prep(params, x.dtype)
    xspec = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, d=d, L=L, scale=scale, G=G),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (3 * D * D + D * D + 2 * D * F + 2 * H * L * d),
            bytes_accessed=2 * B * L * D * x.dtype.itemsize,
            transcendentals=B * (H * L * L + L * F),
        ),
    )(x, *kp)
    return out


def _fb_vjp_fwd(
    x, ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2, num_heads,
):
    params = (ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj,
              ln2_scale, ln2_bias, w1, b1, w2, b2)
    return _fb_fwd_impl(x, params, num_heads), (x, params)


def _fb_vjp_bwd(num_heads, res, g):
    x, params = res
    H = num_heads
    B, L, D = x.shape
    d = D // H
    F = params[8].shape[-1]
    scale = 1.0 / (d**0.5)
    G = _group(B)
    kp = _prep(params, x.dtype)
    xspec = pl.BlockSpec((G, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in kp]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, d=d, L=L, scale=scale, G=G),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp] + [xspec],
        out_specs=tuple([xspec] + [_full_spec(p.shape) for p in kp]),
        out_shape=tuple([jax.ShapeDtypeStruct((B, L, D), x.dtype)] + grad_shapes),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * L * (3 * D * D + D * D + 2 * D * F + 2 * H * L * d),
            bytes_accessed=4 * B * L * D * x.dtype.itemsize,
            transcendentals=2 * B * (H * L * L + L * F),
        ),
    )(x, *kp, g)
    dx = outs[0]
    dparams = [
        gr.reshape(p.shape).astype(p.dtype)
        for gr, p in zip(outs[1:], params)
    ]
    return (dx, *dparams)


fused_block.defvjp(_fb_vjp_fwd, _fb_vjp_bwd)


# ---------------------------------------------------------------------------
# Split-branch kernels — the production path.
#
# The mono-kernel above recomputes the WHOLE forward in its backward, so the
# expensive attention scores are computed twice on the backward pass (once in
# the block recompute, once inside the attention backward itself) — measured
# 18.7 ms device vs 16.2 for the per-sub-layer path at B=384. Splitting the
# block at the residual boundary fixes the recompute asymmetry:
#
#   attn branch: x → x + proj(attention(qkv(LN1(x))))   — backward recomputes
#     only LN1+qkv (one cheap GEMM); the attention output `a` (needed for
#     dW_proj) is stashed to HBM from the forward (21 MB/step ≈ 0.05 ms,
#     far cheaper than recomputing scores+softmax+PV);
#   mlp branch:  x → x + fc2(gelu(fc1(LN2(x))))         — backward recomputes
#     LN2+fc1+gelu (cheap).
#
# Each branch still keeps every intermediate in VMEM and accumulates its
# weight grads in fp32 across the grid, but the attention scores are built
# exactly once per pass — same as the stacked attention kernel — while all
# the surrounding GEMM/LN/elementwise XLA fusions and layout copies collapse
# into the kernels.
# ---------------------------------------------------------------------------


def _attn_branch_fwd_body(x, w6, *, masks, masks_f, scale, L, G, n, cast,
                          groups=None):
    """Flat attn branch: x (G·L, D) → (x_out, a). SINGLE source of the
    forward math for the fwd/fwd-only/chain kernels — a numerics or
    fault-class fix here reaches all of them. Weights already prepped."""
    s1, b1, wqkv, bqkv, wp, bp = w6
    D = x.shape[-1]
    y1, _, _ = _ln_fwd(x, s1, b1, n)
    y1 = y1.astype(cast)
    qkv = (_dot(y1, wqkv) + bqkv).astype(cast)  # (G·L, 3D)
    a_parts = []
    for g in range(G):
        rows = slice(g * L, (g + 1) * L)
        a_parts.append(
            _attn_fwd_one(
                qkv[rows, :D], qkv[rows, D : 2 * D], qkv[rows, 2 * D :],
                masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
            ).astype(cast)
        )
    a = jnp.concatenate(a_parts, axis=0) if G > 1 else a_parts[0]
    p = (_dot(a, wp) + bp).astype(cast)
    return x + p, a


def _mlp_branch_fwd_body(x, w6, *, n, cast):
    """Flat MLP branch: x (G·L, D) → x_out (shared with the chain kernel)."""
    s2, b2, w1, b1f, w2, b2f = w6
    y2, _, _ = _ln_fwd(x, s2, b2, n)
    y2 = y2.astype(cast)
    z = (_dot(y2, w1) + b1f).astype(cast)  # bf16 z, like the flax path
    h = _gelu_fwd(z.astype(jnp.float32)).astype(cast)
    m = (_dot(h, w2) + b2f).astype(cast)
    return x + m


def _attn_branch_fwd_kernel(x_ref, s1, b1, wqkv, bqkv, wp, bp, o_ref, a_ref,
                            *, H, d, L, scale, G, n=None):
    # flat (G·L, D) block: LN/qkv/proj run as ONE GEMM over all G images
    # (M = G·L keeps the MXU M-tiling dense); attention is per-image on
    # static row slices. ``n``: real feature count when the caller padded
    # D up to the 128-lane tile (see ``fused_attn_branch``'s d_real).
    D = x_ref.shape[-1]
    cast = x_ref.dtype
    masks = _masks(H, d, D, cast)
    w6 = (s1[...], b1[...], wqkv[...], bqkv[...], wp[...], bp[...])
    out, a = _attn_branch_fwd_body(
        x_ref[...], w6, masks=masks,
        masks_f=[m.astype(jnp.float32) for m in masks],
        scale=scale, L=L, G=G, n=n, cast=cast, groups=_grouped(H, d, D),
    )
    a_ref[...] = a
    o_ref[...] = out


def _attn_branch_fwd_only_kernel(x_ref, s1, b1, wqkv, bqkv, wp, bp, o_ref,
                                 *, H, d, L, scale, G, n=None):
    # stash-free forward: identical math to _attn_branch_fwd_kernel (same
    # body) but no ``a`` output — the primal (non-differentiated) path of
    # the custom_vjp uses this, so no-grad forwards (JEPA's EMA target
    # encoder, every eval/val pass, probes) skip a (B·L, D) HBM write
    D = x_ref.shape[-1]
    cast = x_ref.dtype
    masks = _masks(H, d, D, cast)
    w6 = (s1[...], b1[...], wqkv[...], bqkv[...], wp[...], bp[...])
    out, _ = _attn_branch_fwd_body(
        x_ref[...], w6, masks=masks,
        masks_f=[m.astype(jnp.float32) for m in masks],
        scale=scale, L=L, G=G, n=n, cast=cast, groups=_grouped(H, d, D),
    )
    o_ref[...] = out


def _attn_branch_bwd_kernel(x_ref, s1, b1, wqkv, bqkv, wp, bp, a_ref, g_ref,
                            dx_ref, ds1, db1, dwqkv, dbqkv, dwp, dbp,
                            *, H, d, L, scale, G, n=None):
    D = x_ref.shape[-1]
    cast = x_ref.dtype
    masks = _masks(H, d, D, cast)
    masks_f = [m.astype(jnp.float32) for m in masks]
    grad_refs = (ds1, db1, dwqkv, dbqkv, dwp, dbp)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    x = x_ref[...]
    gy = g_ref[...]
    a = a_ref[...]
    y1_f, xhat1, inv1 = _ln_fwd(x, s1[...], b1[...], n)
    y1 = y1_f.astype(cast)
    qkv = (_dot(y1, wqkv[...]) + bqkv[...]).astype(cast)
    dp = gy.astype(cast)
    dwp[...] += _dot_tn(a, dp)
    dbp[...] += jnp.sum(gy.astype(jnp.float32), axis=0, keepdims=True)
    da = _dot_nt(dp, wp[...]).astype(cast)
    dqkv_parts = []
    groups = _grouped(H, d, D)
    for g in range(G):
        rows = slice(g * L, (g + 1) * L)
        dq, dk, dv = _attn_bwd_one(
            qkv[rows, :D], qkv[rows, D : 2 * D], qkv[rows, 2 * D :], da[rows],
            masks=masks, masks_f=masks_f, scale=scale, L=L, groups=groups,
        )
        dqkv_parts.append(jnp.concatenate([dq, dk, dv], axis=-1))
    dqkv = jnp.concatenate(dqkv_parts, axis=0) if G > 1 else dqkv_parts[0]
    dqkvc = dqkv.astype(cast)
    dwqkv[...] += _dot_tn(y1, dqkvc)
    dbqkv[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dy1 = _dot_nt(dqkvc, wqkv[...])
    dx_ln, i_ds1, i_db1 = _ln_bwd(dy1, xhat1, inv1, s1[...], n)
    ds1[...] += i_ds1
    db1[...] += i_db1
    dx_ref[...] = (gy.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


def _mlp_branch_fwd_kernel(x_ref, s2, b2, w1, b1f, w2, b2f, o_ref, *, n=None):
    w6 = (s2[...], b2[...], w1[...], b1f[...], w2[...], b2f[...])
    o_ref[...] = _mlp_branch_fwd_body(x_ref[...], w6, n=n, cast=x_ref.dtype)


def _mlp_branch_bwd_kernel(x_ref, s2, b2, w1, b1f, w2, b2f, g_ref,
                           dx_ref, ds2, db2, dw1, db1f, dw2, db2f, *, n=None):
    cast = x_ref.dtype
    grad_refs = (ds2, db2, dw1, db1f, dw2, db2f)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    x = x_ref[...]
    gy = g_ref[...]
    y2_f, xhat2, inv2 = _ln_fwd(x, s2[...], b2[...], n)
    y2 = y2_f.astype(cast)
    z = (_dot(y2, w1[...]) + b1f[...]).astype(cast)
    zf = z.astype(jnp.float32)
    h = _gelu_fwd(zf).astype(cast)
    gc = gy.astype(cast)
    dw2[...] += _dot_tn(h, gc)
    db2f[...] += jnp.sum(gy.astype(jnp.float32), axis=0, keepdims=True)
    dh = _dot_nt(gc, w2[...])
    dz = dh * _gelu_vjp(zf)
    dzc = dz.astype(cast)
    dw1[...] += _dot_tn(y2, dzc)
    db1f[...] += jnp.sum(dz, axis=0, keepdims=True)
    dy2 = _dot_nt(dzc, w1[...])
    dx_ln, i_ds2, i_db2 = _ln_bwd(dy2, xhat2, inv2, s2[...], n)
    ds2[...] += i_ds2
    db2[...] += i_db2
    dx_ref[...] = (gy.astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


def _prep6(params, cast):
    """(ln_s, ln_b, wa, ba, wb, bb) → kernel layouts."""
    s, b, wa, ba, wb, bb = params
    return (
        _as2d(s).astype(jnp.float32), _as2d(b).astype(jnp.float32),
        wa.astype(cast), _as2d(ba).astype(cast),
        wb.astype(cast), _as2d(bb).astype(cast),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_attn_branch(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                       num_heads, d_real):
    # primal (runs when NOT under jax.grad — custom_vjp invokes the fwd
    # rule with residuals only when differentiated): stash-free kernel
    return _ab_fwd_only(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                        num_heads, d_real)


def fused_attn_branch(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                      num_heads, d_real=None):
    """x + proj(head-stacked-attention(qkv(LN(x)))) as one Pallas kernel.

    ``d_real``: real feature count when the caller zero-padded D up to the
    128-lane tile (sub-lane-tile model dims like the JEPA predictor's D=96
    hard-fault Mosaic; padded to 128 they run the proven D≥128 path — the
    MXU pads 96→128 lanes anyway, so the extra columns are free). LN
    statistics use d_real; padded weight entries must be zero.
    """
    return _fused_attn_branch(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                              num_heads, d_real)


def _flat_spec(G, L, D):
    """Flat (G·L, D) block over a (B·L, D) array (M-dense MXU tiling)."""
    return pl.BlockSpec((G * L, D), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _ab_fwd_only(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads,
                 d_real=None):
    """Stash-free forward (single output) for non-differentiated calls."""
    params = (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)
    B, L, D = x.shape
    H = num_heads
    dr = D if d_real is None else d_real
    d = dr // H
    n = None if dr == D else dr
    scale = 1.0 / (d**0.5)
    G = _flat_group(B, L)
    kp = _prep6(params, x.dtype)
    xspec = _flat_spec(G, L, D)
    xo = pl.pallas_call(
        functools.partial(_attn_branch_fwd_only_kernel, H=H, d=d, L=L,
                          scale=scale, G=G, n=n),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B * L, D), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (3 * D * D + D * D + 2 * H * L * d),
            bytes_accessed=2 * B * L * D * x.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(x.reshape(B * L, D), *kp)
    return xo.reshape(B, L, D)


def _ab_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads,
            d_real=None):
    params = (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)
    B, L, D = x.shape
    H = num_heads
    dr = D if d_real is None else d_real
    d = dr // H
    n = None if dr == D else dr
    scale = 1.0 / (d**0.5)
    G = _flat_group(B, L)
    kp = _prep6(params, x.dtype)
    xspec = _flat_spec(G, L, D)
    shape = jax.ShapeDtypeStruct((B * L, D), x.dtype)
    xo, a = pl.pallas_call(
        functools.partial(_attn_branch_fwd_kernel, H=H, d=d, L=L, scale=scale,
                          G=G, n=n),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp],
        out_specs=(xspec, xspec),
        out_shape=(shape, shape),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (3 * D * D + D * D + 2 * H * L * d),
            bytes_accessed=3 * B * L * D * x.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(x.reshape(B * L, D), *kp)
    return xo.reshape(B, L, D), (x, params, a)


def _ab_bwd(num_heads, d_real, res, g):
    x, params, a = res
    B, L, D = x.shape
    H = num_heads
    dr = D if d_real is None else d_real
    d = dr // H
    n = None if dr == D else dr
    scale = 1.0 / (d**0.5)
    G = _flat_group(B, L)
    kp = _prep6(params, x.dtype)
    xspec = _flat_spec(G, L, D)
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in kp]
    outs = pl.pallas_call(
        functools.partial(_attn_branch_bwd_kernel, H=H, d=d, L=L, scale=scale,
                          G=G, n=n),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp] + [xspec, xspec],
        out_specs=tuple([xspec] + [_full_spec(p.shape) for p in kp]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B * L, D), x.dtype)] + grad_shapes
        ),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=5 * B * L * (3 * D * D + D * D + 2 * H * L * d),
            bytes_accessed=5 * B * L * D * x.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(x.reshape(B * L, D), *kp, a, g.reshape(B * L, D))
    dx = outs[0].reshape(B, L, D)
    dparams = [
        gr.reshape(p.shape).astype(p.dtype) for gr, p in zip(outs[1:], params)
    ]
    return (dx, *dparams)


_fused_attn_branch.defvjp(
    lambda x, s, b, wq, bq, wp, bp, H, dr: _ab_fwd(x, s, b, wq, bq, wp, bp, H, dr),
    _ab_bwd,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_mlp_branch(x, ln_scale, ln_bias, w1, b1, w2, b2, d_real):
    return _mb_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, d_real)[0]


def fused_mlp_branch(x, ln_scale, ln_bias, w1, b1, w2, b2, d_real=None):
    """x + fc2(gelu(fc1(LN(x)))) as one Pallas kernel (exact-erf GELU).

    ``d_real`` as in ``fused_attn_branch``: real feature count under lane
    padding (zero pad cols/weights; LN statistics over d_real features).
    """
    return _fused_mlp_branch(x, ln_scale, ln_bias, w1, b1, w2, b2, d_real)


def _mb_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, d_real=None):
    params = (ln_scale, ln_bias, w1, b1, w2, b2)
    B, L, D = x.shape
    F = w1.shape[-1]
    n = None if (d_real is None or d_real == D) else d_real
    G = _flat_group(B, L)
    kp = _prep6(params, x.dtype)
    xspec = _flat_spec(G, L, D)
    xo = pl.pallas_call(
        functools.partial(_mlp_branch_fwd_kernel, n=n),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B * L, D), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L * D * F,
            bytes_accessed=2 * B * L * D * x.dtype.itemsize,
            transcendentals=B * L * F,
        ),
    )(x.reshape(B * L, D), *kp)
    return xo.reshape(B, L, D), (x, params)


def _mb_bwd(d_real, res, g):
    x, params = res
    B, L, D = x.shape
    F = params[2].shape[-1]
    n = None if (d_real is None or d_real == D) else d_real
    G = _flat_group(B, L)
    kp = _prep6(params, x.dtype)
    xspec = _flat_spec(G, L, D)
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in kp]
    outs = pl.pallas_call(
        functools.partial(_mlp_branch_bwd_kernel, n=n),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp] + [xspec],
        out_specs=tuple([xspec] + [_full_spec(p.shape) for p in kp]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B * L, D), x.dtype)] + grad_shapes
        ),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * L * D * F,
            bytes_accessed=4 * B * L * D * x.dtype.itemsize,
            transcendentals=2 * B * L * F,
        ),
    )(x.reshape(B * L, D), *kp, g.reshape(B * L, D))
    dx = outs[0].reshape(B, L, D)
    dparams = [
        gr.reshape(p.shape).astype(p.dtype) for gr, p in zip(outs[1:], params)
    ]
    return (dx, *dparams)


_fused_mlp_branch.defvjp(_mb_fwd, _mb_bwd)


# The verdicts depend on the SSRL_BLOCK_GROUP env override (via
# _group/_flat_group), so the override participates in the cache key —
# otherwise changing it mid-process would reuse a VMEM verdict computed at
# a different G than the one the kernel actually launches with.
@functools.lru_cache(maxsize=None)
def _supported_cached_keyed(B, H, L, D, F, dtype_name, group_env):
    return supported(B, H, L, D, F, dtype_name)


def _supported_cached(B, H, L, D, F, dtype_name):
    return _supported_cached_keyed(
        B, H, L, D, F, dtype_name, os.environ.get("SSRL_BLOCK_GROUP")
    )


@functools.lru_cache(maxsize=None)
def _split_supported_cached_keyed(B, H, L, D, F, dtype_name, d_real, group_env):
    return split_supported(B, H, L, D, F, dtype_name, d_real)


def _split_supported_cached(B, H, L, D, F, dtype_name, d_real=None):
    return _split_supported_cached_keyed(
        B, H, L, D, F, dtype_name, d_real, os.environ.get("SSRL_BLOCK_GROUP")
    )


# Lane-tile width: sub-lane model dims (D < 128) are zero-padded up to this
# for the "split_pad" route — the MXU pads lanes to 128 regardless, so the
# extra columns cost no MXU passes, and at D=128 the kernels run the
# hardware-proven D≥128 configuration instead of the faulting sub-lane one.
_LANE = 128


def block_impl(B: int, L: int, D: int, H: int, F: int, dtype, impl: str):
    """Kernel policy for a transformer block.

    Returns ``"split"`` (production: attn-branch + mlp-branch kernels),
    ``"split_pad"`` (split kernels on features zero-padded to the 128-lane
    tile — the production route for sub-lane dims like the JEPA predictor's
    D=96), ``"mono"`` (whole-block kernel; measured-and-kept for ablation —
    docs/PERFORMANCE.md), or ``None`` (per-sub-layer flax path). ``auto``
    picks split (or split_pad for D<128) on TPU; ``impl='split'``/``'block'``/
    ``'split_pad'`` force (raising when the shape is unsupported); any other
    explicit impl ("xla", "pallas", "packed", "stacked") keeps the sub-layer
    path so the kernel lineage stays independently testable.
    """
    from ssrl_vit_mae_jepa_tpu.ops.attention import validate_impl

    validate_impl(impl)
    if impl not in ("auto", "block", "split", "split_pad"):
        return None
    try:
        dtype = jnp.dtype(dtype)  # accept dtype instances and scalar types
    except TypeError:
        pass
    if impl == "split_pad" or (impl == "auto" and 0 < D < _LANE):
        # sub-lane-tile model dim: the flat split kernels at the RAW D
        # hard-fault Mosaic (measured: worker crash at L=145, D=96, H=6;
        # every D=144/192 shape passes — the trigger is the implicit
        # 96→128 lane padding combined with per-image row slices at odd
        # offsets). Zero-padding D up to 128 outside the kernel runs the
        # proven configuration; LN statistics use the real D (d_real).
        padded_ok = (
            D % H == 0
            and D < _LANE
            and _split_supported_cached(B, H, L, _LANE, F, str(dtype), D)
        )
        if impl == "split_pad":
            if not padded_ok:
                raise ValueError(
                    f"padded fused block unsupported for B={B} L={L} D={D} "
                    f"H={H} F={F}"
                )
            return "split_pad"
        from ssrl_vit_mae_jepa_tpu.ops.attention import _on_tpu

        return "split_pad" if (padded_ok and _on_tpu()) else None
    try:
        ok = _supported_cached(B, H, L, D, F, str(dtype))
    except Exception:
        return None
    # the flat split kernels additionally need a legal image group —
    # (G·L) % 8 == 0 with G | B (Mosaic sublane constraint), e.g. B=100
    # at L=145 has none — and a VMEM bound at the group they actually run
    # with (split_supported), which can be several× the mono live set
    splittable = _split_supported_cached(B, H, L, D, F, str(dtype))
    if impl in ("block", "split"):
        if not ok or (impl == "split" and not splittable):
            raise ValueError(
                f"fused block unsupported for B={B} L={L} D={D} H={H} F={F}"
            )
        return "mono" if impl == "block" else "split"
    from ssrl_vit_mae_jepa_tpu.ops.attention import _on_tpu

    # auto for D >= 128 additionally requires head dim >= 24: the
    # documented fault class is batch/G-dependent and only D=144/192
    # (d=24/32) shapes are hardware-validated on the flat kernels
    if (D // H) < 24:
        return None
    return "split" if (ok and splittable and _on_tpu()) else None


def pad_attn_branch_params(ln_s, ln_b, wqkv, bqkv, wp, bp, pad: int):
    """Zero-pad attn-branch params from D to D+pad (q/k/v blocks separately,
    so the kernel's ``[:, :D] / [:, D:2D] / [:, 2D:]`` slices stay aligned)."""
    D = wp.shape[0]
    return (
        jnp.pad(ln_s, (0, pad)), jnp.pad(ln_b, (0, pad)),
        jnp.pad(wqkv.reshape(D, 3, D), ((0, pad), (0, 0), (0, pad))).reshape(
            D + pad, 3 * (D + pad)
        ),
        jnp.pad(bqkv.reshape(3, D), ((0, 0), (0, pad))).reshape(-1),
        jnp.pad(wp, ((0, pad), (0, pad))), jnp.pad(bp, (0, pad)),
    )


def pad_mlp_branch_params(ln_s, ln_b, w1, b1, w2, b2, pad: int):
    """Zero-pad mlp-branch params from D to D+pad (hidden dim F unchanged)."""
    return (
        jnp.pad(ln_s, (0, pad)), jnp.pad(ln_b, (0, pad)),
        jnp.pad(w1, ((0, pad), (0, 0))), b1,
        jnp.pad(w2, ((0, 0), (0, pad))), jnp.pad(b2, (0, pad)),
    )


def use_fused_block(B: int, L: int, D: int, H: int, F: int, dtype, impl: str) -> bool:
    """True when ``block_impl`` selects any fused-block kernel."""
    return block_impl(B, L, D, H, F, dtype, impl) is not None
