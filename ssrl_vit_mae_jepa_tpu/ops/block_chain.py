"""Weight-resident multi-block Pallas kernel: N transformer blocks per pass.

The flat split-branch kernels (``block_pallas.py``) already keep each
residual branch in VMEM, but between branches/blocks the activations and —
on the backward pass — the gradient chain still round-trip HBM, and every
kernel boundary invites XLA relayout copies (the measured ~6 ms non-kernel
tail of the 28 ms MAE step at B=768, docs/PERFORMANCE.md round-3 profile).
This kernel runs ALL N blocks of an encoder/decoder stack over one flat
(G·L, D) row group per grid step:

  forward: x → [attn-branch → mlp-branch] × N, stashing per block the
    branch inputs the backward needs (a_k, x_mid_k, x_in_k) — the same
    arrays the per-block kernels already wrote, so forward HBM traffic is
    unchanged while (N−1) boundary reads disappear;
  backward: walks the blocks in reverse INSIDE the kernel — the gradient
    chain never leaves VMEM — rematerializing only the cheap LN/qkv/fc1
    GEMMs per branch (attention scores are built exactly once per pass,
    same recompute policy as the split kernels) and accumulating all 12·N
    weight gradients in fp32 VMEM refs across the whole grid sweep.

Weights for every block stay VMEM-resident for the entire batch sweep
(constant-index BlockSpecs): the flagship stacks hold ~0.5–1.8 MB of bf16
weights, trivially resident. Numerics identical to the split kernels
(fp32 LN/softmax/accumulation, exact-erf GELU, bf16 GEMM IO). Supports the
lane-padded sub-lane route via ``d_real`` exactly like ``fused_attn_branch``.

Policy: ``chain_impl`` — auto on TPU whenever every block of the stack
would take the split/split_pad route (same guards), forced with
``attn_impl='chain'`` for interpret-mode parity tests.
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
from ssrl_vit_mae_jepa_tpu.ops.block_pallas import (
    _attn_branch_fwd_body,
    _mlp_branch_fwd_body,
    _dot,
    _dot_nt,
    _dot_tn,
    _flat_group,
    _flat_spec,
    _full_spec,
    _gelu_fwd,
    _gelu_vjp,
    _ln_bwd,
    _ln_fwd,
    _prep6,
    split_supported,
)

# The chain backward holds one branch's live set plus all N blocks' fp32
# weight-grad accumulators and the per-step stash blocks; 64 MB leaves 2×
# headroom over the measured decoder live set inside v5e's 128 MB VMEM.
_CHAIN_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _chain_fwd_only_kernel(x_ref, *rest, H, d, L, scale, G, N, n):
    # stash-free forward: the custom_vjp PRIMAL path — no-grad forwards
    # (eval passes, probes, a forced-chain EMA target encoder) skip the
    # 3N−1 (G·L, D) HBM stash writes the differentiated fwd rule needs
    w_refs = rest[: 12 * N]
    o_ref = rest[12 * N]
    cast = x_ref.dtype
    D = x_ref.shape[-1]
    masks = _masks(H, d, D, cast)
    masks_f = [m.astype(jnp.float32) for m in masks]
    groups = _grouped(H, d, D)
    x = x_ref[...]
    for k in range(N):
        wk = [r[...] for r in w_refs[12 * k : 12 * k + 12]]
        x, _ = _attn_branch_fwd_body(
            x, wk[:6], masks=masks, masks_f=masks_f, scale=scale, L=L, G=G,
            n=n, cast=cast, groups=groups,
        )
        x = _mlp_branch_fwd_body(x, wk[6:], n=n, cast=cast)
    o_ref[...] = x


def _chain_fwd_kernel(x_ref, *rest, H, d, L, scale, G, N, n):
    # rest: 12N weight refs · o_ref · N a_refs · N mid_refs · (N−1) xin_refs
    w_refs = rest[: 12 * N]
    o_ref = rest[12 * N]
    a_refs = rest[12 * N + 1 : 12 * N + 1 + N]
    mid_refs = rest[12 * N + 1 + N : 12 * N + 1 + 2 * N]
    xin_refs = rest[12 * N + 1 + 2 * N :]
    cast = x_ref.dtype
    D = x_ref.shape[-1]
    masks = _masks(H, d, D, cast)
    masks_f = [m.astype(jnp.float32) for m in masks]
    groups = _grouped(H, d, D)
    x = x_ref[...]
    for k in range(N):
        wk = [r[...] for r in w_refs[12 * k : 12 * k + 12]]
        if k > 0:
            xin_refs[k - 1][...] = x
        x, a = _attn_branch_fwd_body(
            x, wk[:6], masks=masks, masks_f=masks_f, scale=scale, L=L, G=G,
            n=n, cast=cast, groups=groups,
        )
        a_refs[k][...] = a
        mid_refs[k][...] = x
        x = _mlp_branch_fwd_body(x, wk[6:], n=n, cast=cast)
    o_ref[...] = x


def _chain_bwd_kernel(x_ref, *rest, H, d, L, scale, G, N, n):
    # rest: 12N weight refs · N a_refs · N mid_refs · (N−1) xin_refs · g_ref
    #       then outputs: dx_ref · 12N grad refs
    w_refs = rest[: 12 * N]
    a_refs = rest[12 * N : 12 * N + N]
    mid_refs = rest[12 * N + N : 12 * N + 2 * N]
    xin_refs = rest[12 * N + 2 * N : 12 * N + 3 * N - 1]
    g_ref = rest[12 * N + 3 * N - 1]
    dx_ref = rest[12 * N + 3 * N]
    grad_refs = rest[12 * N + 3 * N + 1 :]
    cast = x_ref.dtype
    D = x_ref.shape[-1]
    masks = _masks(H, d, D, cast)
    masks_f = [m.astype(jnp.float32) for m in masks]
    groups = _grouped(H, d, D)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    gy = g_ref[...].astype(jnp.float32)  # fp32 gradient chain in VMEM
    for k in range(N - 1, -1, -1):
        wk = [r[...] for r in w_refs[12 * k : 12 * k + 12]]
        s1, b1, wqkv, bqkv, wp, bp, s2, b2, w1, b1f, w2, b2f = wk
        gk = grad_refs[12 * k : 12 * k + 12]
        (ds1, db1, dwqkv, dbqkv, dwp, dbp, ds2, db2, dw1, db1f, dw2, db2f) = gk
        # ---- mlp branch backward (recompute LN2+fc1+gelu from x_mid) ----
        x_mid = mid_refs[k][...]
        y2_f, xhat2, inv2 = _ln_fwd(x_mid, s2, b2, n)
        y2 = y2_f.astype(cast)
        z = (_dot(y2, w1) + b1f).astype(cast)
        zf = z.astype(jnp.float32)
        h = _gelu_fwd(zf).astype(cast)
        gc = gy.astype(cast)
        dw2[...] += _dot_tn(h, gc)
        db2f[...] += jnp.sum(gy, axis=0, keepdims=True)
        dh = _dot_nt(gc, w2)
        dz = dh * _gelu_vjp(zf)
        dzc = dz.astype(cast)
        dw1[...] += _dot_tn(y2, dzc)
        db1f[...] += jnp.sum(dz, axis=0, keepdims=True)
        dy2 = _dot_nt(dzc, w1)
        dx_ln, i_ds2, i_db2 = _ln_bwd(dy2, xhat2, inv2, s2, n)
        ds2[...] += i_ds2
        db2[...] += i_db2
        gy = gy + dx_ln  # gradient at x_mid
        # ---- attn branch backward (recompute LN1+qkv from x_in) ----
        x_in = x_ref[...] if k == 0 else xin_refs[k - 1][...]
        a = a_refs[k][...]
        y1_f, xhat1, inv1 = _ln_fwd(x_in, s1, b1, n)
        y1 = y1_f.astype(cast)
        qkv = (_dot(y1, wqkv) + bqkv).astype(cast)
        dp = gy.astype(cast)
        dwp[...] += _dot_tn(a, dp)
        dbp[...] += jnp.sum(gy, axis=0, keepdims=True)
        da = _dot_nt(dp, wp).astype(cast)
        dqkv_parts = []
        for g in range(G):
            rows = slice(g * L, (g + 1) * L)
            dq, dk, dv = _attn_bwd_one(
                qkv[rows, :D], qkv[rows, D : 2 * D], qkv[rows, 2 * D :],
                da[rows], masks=masks, masks_f=masks_f, scale=scale, L=L,
                groups=groups,
            )
            dqkv_parts.append(jnp.concatenate([dq, dk, dv], axis=-1))
        dqkv = jnp.concatenate(dqkv_parts, axis=0) if G > 1 else dqkv_parts[0]
        dqkvc = dqkv.astype(cast)
        dwqkv[...] += _dot_tn(y1, dqkvc)
        dbqkv[...] += jnp.sum(dqkv, axis=0, keepdims=True)
        dy1 = _dot_nt(dqkvc, wqkv)
        dx_ln1, i_ds1, i_db1 = _ln_bwd(dy1, xhat1, inv1, s1, n)
        ds1[...] += i_ds1
        db1[...] += i_db1
        gy = gy + dx_ln1  # gradient at x_in = previous block's output
    dx_ref[...] = gy.astype(dx_ref.dtype)


def _prep_chain(params_list, cast):
    """List of 12-tuples (flax layouts) → flat tuple of kernel layouts."""
    kp = []
    for p in params_list:
        kp.extend(_prep6(p[:6], cast))
        kp.extend(_prep6(p[6:], cast))
    return tuple(kp)


def _chain_geometry(x, num_heads, d_real):
    B, L, D = x.shape
    dr = D if d_real is None else d_real
    d = dr // num_heads
    n = None if dr == D else dr
    scale = 1.0 / (d**0.5)
    G = _flat_group(B, L)
    return B, L, D, d, n, scale, G


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_block_chain(x, params_list, num_heads, d_real):
    # primal (runs when NOT under jax.grad — custom_vjp invokes the fwd
    # rule with residuals only when differentiated): stash-free kernel
    return _chain_fwd_only(x, params_list, num_heads, d_real)


def fused_block_chain(x, params_list, num_heads, d_real=None):
    """N pre-LN transformer blocks as ONE weight-resident Pallas kernel.

    ``params_list``: per block a 12-tuple in ``fused_block`` order
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, w1, b1, w2, b2),
    flax layouts. ``d_real`` as in ``fused_attn_branch`` (lane padding).
    """
    return _fused_block_chain(x, tuple(tuple(p) for p in params_list),
                              num_heads, d_real)


def _chain_fwd_only(x, params_list, num_heads, d_real):
    """Stash-free forward (single output) for non-differentiated calls."""
    N = len(params_list)
    B, L, D, d, n, scale, G = _chain_geometry(x, num_heads, d_real)
    kp = _prep_chain(params_list, x.dtype)
    xspec = _flat_spec(G, L, D)
    xo = pl.pallas_call(
        functools.partial(
            _chain_fwd_only_kernel, H=num_heads, d=d, L=L, scale=scale, G=G,
            N=N, n=n,
        ),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B * L, D), x.dtype),
        compiler_params=_CHAIN_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * B * L * (4 * D * D + 2 * D * kp[8].shape[-1]
                                   + 2 * num_heads * L * d),
            bytes_accessed=2 * B * L * D * x.dtype.itemsize,
            transcendentals=N * B * (num_heads * L * L + L * kp[8].shape[-1]),
        ),
    )(x.reshape(B * L, D), *kp)
    return xo.reshape(B, L, D)


def _chain_fwd(x, params_list, num_heads, d_real):
    N = len(params_list)
    B, L, D, d, n, scale, G = _chain_geometry(x, num_heads, d_real)
    kp = _prep_chain(params_list, x.dtype)
    xspec = _flat_spec(G, L, D)
    shape = jax.ShapeDtypeStruct((B * L, D), x.dtype)
    outs = pl.pallas_call(
        functools.partial(
            _chain_fwd_kernel, H=num_heads, d=d, L=L, scale=scale, G=G, N=N, n=n
        ),
        grid=(B // G,),
        in_specs=[xspec] + [_full_spec(p.shape) for p in kp],
        out_specs=tuple([xspec] * (3 * N)),
        out_shape=tuple([shape] * (3 * N)),
        compiler_params=_CHAIN_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * B * L * (4 * D * D + 2 * D * kp[8].shape[-1]
                                   + 2 * num_heads * L * d),
            bytes_accessed=(2 + 3 * N) * B * L * D * x.dtype.itemsize,
            transcendentals=N * B * (num_heads * L * L + L * kp[8].shape[-1]),
        ),
    )(x.reshape(B * L, D), *kp)
    out = outs[0].reshape(B, L, D)
    stashes = outs[1:]
    return out, (x, params_list, stashes)


def _chain_bwd(num_heads, d_real, res, g):
    x, params_list, stashes = res
    N = len(params_list)
    B, L, D, d, n, scale, G = _chain_geometry(x, num_heads, d_real)
    kp = _prep_chain(params_list, x.dtype)
    xspec = _flat_spec(G, L, D)
    grad_shapes = [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in kp]
    outs = pl.pallas_call(
        functools.partial(
            _chain_bwd_kernel, H=num_heads, d=d, L=L, scale=scale, G=G, N=N, n=n
        ),
        grid=(B // G,),
        in_specs=(
            [xspec] + [_full_spec(p.shape) for p in kp]
            + [xspec] * (3 * N - 1) + [xspec]
        ),
        out_specs=tuple([xspec] + [_full_spec(p.shape) for p in kp]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B * L, D), x.dtype)] + grad_shapes
        ),
        compiler_params=_CHAIN_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=5 * N * B * L * (4 * D * D + 2 * D * kp[8].shape[-1]
                                   + 2 * num_heads * L * d),
            bytes_accessed=(3 + 3 * N) * B * L * D * x.dtype.itemsize,
            transcendentals=N * B * (num_heads * L * L + L * kp[8].shape[-1]),
        ),
    )(x.reshape(B * L, D), *kp, *stashes, g.reshape(B * L, D))
    dx = outs[0].reshape(B, L, D)
    flat_grads = outs[1:]
    dparams = []
    for k in range(N):
        blk = []
        for j, p in enumerate(params_list[k]):
            gr = flat_grads[12 * k + j]
            blk.append(gr.reshape(p.shape).astype(p.dtype))
        dparams.append(tuple(blk))
    return (dx, tuple(dparams))


_fused_block_chain.defvjp(
    lambda x, pl_, H, dr: _chain_fwd(x, pl_, H, dr),
    _chain_bwd,
)


@functools.lru_cache(maxsize=None)
def _chain_ok_keyed(B, H, L, D, F, N, dtype_name, d_real, group_env):
    return _chain_ok_uncached(B, H, L, D, F, N, dtype_name, d_real)


def _chain_ok(B, H, L, D, F, N, dtype_name, d_real):
    # the verdict depends on SSRL_BLOCK_GROUP (via _flat_group), so the
    # override participates in the cache key — same fix as block_pallas
    return _chain_ok_keyed(
        B, H, L, D, F, N, dtype_name, d_real,
        os.environ.get("SSRL_BLOCK_GROUP"),
    )


def _chain_ok_uncached(B, H, L, D, F, N, dtype_name, d_real):
    """Shape/VMEM guard for the chain kernel.

    ``split_supported`` bounds ONE branch's live set; the chain kernel
    additionally keeps ALL N blocks' weights + their fp32 gradient
    accumulators resident and (in bwd) reads 3N−1 stash blocks per grid
    step, so reusing the per-branch bound would understate the real live
    set several-fold at depth — exactly the class of under-estimate the
    split bound was added to fix. Bound everything against the 64 MB
    ``vmem_limit_bytes`` the chain kernels compile with (48 MB budget
    leaves scheduler headroom). Repo production shapes land ≈24-27 MB.
    """
    if not split_supported(B, H, L, D, F, dtype_name, d_real):
        return False
    G = _flat_group(B, L)
    if G is None:
        return False
    rows = G * L
    weights = 2 * N * (4 * D * D + 2 * D * F)   # bf16, all blocks resident
    grads = 2 * weights                          # fp32 accumulators
    stash = 2 * (3 * N - 1) * rows * D           # bwd stash inputs
    Lp = -(-L // 128) * 128
    attn_rows = rows * 11 * D + 4 * H * L * max(Lp, D)
    mlp_rows = rows * (5 * D + 4 * F)
    itm = 4 * max(attn_rows, mlp_rows)           # live branch working set
    return itm + weights + grads + stash < 48 * 1024 * 1024


def chain_impl(B: int, L: int, D: int, H: int, F: int, depth: int,
               dtype, impl: str):
    """Policy: run the whole block stack as one chain kernel?

    Returns ``(True, d_real)`` (``d_real`` set for sub-lane dims → lane-pad
    to 128 first) or ``(False, None)``. ``impl='chain'`` forces it (raising
    if unsupported) for interpret-mode parity tests and ablation.

    ``auto`` never takes the chain: measured on v5e at the flagship MAE
    shapes (B=768), the chain ran 32.2 ms/step vs 29.4 ms for the split
    kernels — every fused-pass kernel was 10–20% slower than the sum of
    its per-block split kernels (profiler device sums: decoder bwd 10.7 vs
    9.96 ms, encoder bwd 6.4 vs 5.4, decoder fwd 5.6 vs 4.6) and the
    ~6 ms non-kernel tail it was built to shrink turned out to live in the
    loss/augment/patchify path, not at block boundaries. Measured lever,
    rejected — see docs/PERFORMANCE.md round-3 table.
    """
    from ssrl_vit_mae_jepa_tpu.ops.attention import validate_impl

    validate_impl(impl)
    if impl != "chain" or depth < 2:
        if impl == "chain" and depth < 2:
            raise ValueError("chain kernel needs depth >= 2")
        return False, None
    try:
        dtype = jnp.dtype(dtype)
    except TypeError:
        pass
    if D >= 128:
        ok = D % H == 0 and _chain_ok(B, H, L, D, F, depth, str(dtype), None)
        d_real = None
    else:
        ok = D % H == 0 and _chain_ok(B, H, L, 128, F, depth, str(dtype), D)
        d_real = D
    if not ok:
        raise ValueError(
            f"chain kernel unsupported for B={B} L={L} D={D} H={H} F={F}"
        )
    return True, d_real
