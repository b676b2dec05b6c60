"""Vision Transformer — pure-functional flax module, TPU-first.

Re-implements the behavioral contract of timm 1.0.21's ``VisionTransformer``
as used by the reference (``src/models/mae.py:28-36``,
``src/training/classifier.py:49-57``; contract in SURVEY.md §2.2):

- patch embedding (8×8 stride-8) — realized as **patchify + matmul** rather
  than a conv so XLA tiles it straight onto the MXU; the weight layout is
  convertible 1:1 from timm's conv kernel,
- prepended CLS token, learned position embedding over the full
  (1 + N)-token sequence, pre-LN transformer blocks (MHSA + MLP ratio 4,
  GELU), final LayerNorm,
- ``num_classes=0`` semantics: the module returns the (B, L, D) token
  sequence (timm ``forward_features``),
- blocks addressable by index for the freeze-last-n policy (reference
  ``src/training/classifier.py:139-171``) — realized as optimizer masking
  over the ``blocks_{i}`` parameter sub-trees,
- the masked-encoder path (lightly ``MaskedVisionTransformerTIMM.encode``,
  reference ``src/models/mae.py:85``): pos-embed is added first, then only
  ``idx_keep`` tokens are gathered and the blocks run on the short sequence.

Compute dtype is bf16 by default with fp32 params (mirrors the reference's
bf16-mixed autocast, ``scripts/training/pretrain_mae.py:123``); LayerNorm
statistics and softmax run in fp32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.ops.attention import multi_head_attention
from ssrl_vit_mae_jepa_tpu.ops.masking import get_at_index_mm
from ssrl_vit_mae_jepa_tpu.ops.patches import patchify

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def _platform() -> str:
    import jax

    try:
        return jax.devices()[0].platform
    except Exception:
        return "cpu"


def _dot_dense(x, w, b, dtype):
    """``nn.Dense``'s promote-then-matmul, on raw params."""
    return jnp.dot(x.astype(dtype), w.astype(dtype)) + b.astype(dtype)


class _PatchEmbedParams(nn.Module):
    """Declares the patch-embed Dense parameters and returns them raw.

    Same names ("kernel"/"bias"), shapes, inits, and fp32 storage as the
    ``nn.Dense(name="patch_embed")`` it replaces, so checkpoints and torch
    interop are byte-identical — but the VALUES are exposed so the caller
    can route them either through the unfused matmul (exactly what Dense
    computed) or the fused Pallas prologue (ops/embed_pallas.py)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return w, b


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.hidden_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.out_dim,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="fc2",
        )(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        from ssrl_vit_mae_jepa_tpu.ops.attention import (
            mha_natural,
            mha_natural_qkv,
            use_packed,
            use_stacked_split,
        )

        B, L, D = x.shape
        h = self.num_heads
        hd = D // h
        qkv = nn.Dense(
            3 * D, dtype=self.dtype, kernel_init=trunc_normal_init, name="qkv"
        )(x)
        if use_packed(B, L, D, h, qkv.dtype, self.attn_impl):
            # head-stacked kernel consumes the fused (B, L, 3D) tensor
            # straight from the qkv GEMM — no head transposes, no q/k/v
            # slices, and a single dqkv gradient (no concat) on the way back
            out = mha_natural_qkv(qkv, h)
        elif use_stacked_split(B, L, D, h, qkv.dtype, self.attn_impl):
            # sub-lane-tile dims (D<128): slice q/k/v OUTSIDE the kernel
            # (XLA handles the unaligned lane slices safely) and use the
            # split-input stacked kernel — the fused-qkv form hard-faults
            # at these shapes (see ops.attention policy docstrings)
            out = mha_natural(
                qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :], h
            )
        else:
            qkv = qkv.reshape(B, L, 3, h, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            out = multi_head_attention(q, k, v, impl=self.attn_impl)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        out = nn.Dense(
            D, dtype=self.dtype, kernel_init=trunc_normal_init, name="proj"
        )(out)
        return out


class _LNParams(nn.Module):
    """Declares LayerNorm params (same tree/init as ``nn.LayerNorm``)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.dim,), jnp.float32),
            self.param("bias", nn.initializers.zeros_init(), (self.dim,), jnp.float32),
        )


class _DenseParams(nn.Module):
    """Declares Dense params (same tree/init as the ``nn.Dense`` calls here)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", trunc_normal_init, (self.in_dim, self.out_dim), jnp.float32),
            self.param("bias", nn.initializers.zeros_init(), (self.out_dim,), jnp.float32),
        )


class _AttnParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.dim, 3 * self.dim, name="qkv")(),
            _DenseParams(self.dim, self.dim, name="proj")(),
        )


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.dim, self.hidden, name="fc1")(),
            _DenseParams(self.hidden, self.dim, name="fc2")(),
        )


class _BlockParams(nn.Module):
    """Declares one Block's EXACT param tree without computing (used by the
    weight-resident chain kernel, which consumes all blocks' params at
    once). Tree-identical to ``Block``'s fused path: norm1/attn/norm2/mlp."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        s1, b1 = _LNParams(self.dim, name="norm1")()
        (wqkv, bqkv), (wp, bp) = _AttnParams(self.dim, name="attn")()
        s2, b2 = _LNParams(self.dim, name="norm2")()
        (w1, b1f), (w2, b2f) = _MlpParams(self.dim, self.hidden, name="mlp")()
        return (s1, b1, wqkv, bqkv, wp, bp, s2, b2, w1, b1f, w2, b2f)


_BLOCK_TREE = (
    ("norm1", "scale"), ("norm1", "bias"),
    ("attn", "qkv", "kernel"), ("attn", "qkv", "bias"),
    ("attn", "proj", "kernel"), ("attn", "proj", "bias"),
    ("norm2", "scale"), ("norm2", "bias"),
    ("mlp", "fc1", "kernel"), ("mlp", "fc1", "bias"),
    ("mlp", "fc2", "kernel"), ("mlp", "fc2", "bias"),
)


def _block_tree(p12):
    """12-tuple (``fused_block`` order) → Block's nested flax param dict."""
    tree: dict = {}
    for path, leaf in zip(_BLOCK_TREE, p12):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = leaf
    return tree


def run_block_stack(x, param_mods, dim, num_heads, mlp_ratio, dtype, attn_impl):
    """Run a stack of transformer blocks over declared per-block params.

    ``param_mods``: ``_BlockParams`` submodules (one per block, canonical
    names) — the SINGLE param declaration for both routes. On TPU, when
    every block would take the fused split route, the whole stack runs as
    ONE weight-resident chain kernel (``ops/block_chain.py``: activations
    and the backward gradient chain never leave VMEM between blocks);
    otherwise each block's params are injected into the standard ``Block``
    module (identical math and dispatch). Param tree, checkpoints, freeze
    masks and torch interop are unaffected by the route taken.
    """
    from ssrl_vit_mae_jepa_tpu.ops.block_chain import chain_impl, fused_block_chain

    B, L, D = x.shape
    depth = len(param_mods)
    hidden = int(dim * mlp_ratio)
    params = [m() for m in param_mods]
    use_chain, d_real = chain_impl(B, L, D, num_heads, hidden, depth,
                                   jnp.dtype(dtype), attn_impl)
    if use_chain:
        x = x.astype(dtype)
        if d_real is not None:
            from ssrl_vit_mae_jepa_tpu.ops.block_pallas import (
                pad_attn_branch_params,
                pad_mlp_branch_params,
            )

            pad = 128 - D
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            padded = [
                pad_attn_branch_params(*p[:6], pad)
                + pad_mlp_branch_params(*p[6:], pad)
                for p in params
            ]
            return fused_block_chain(xp, padded, num_heads, d_real=D)[..., :D]
        return fused_block_chain(x, params, num_heads)
    from ssrl_vit_mae_jepa_tpu.ops.block_pallas import block_impl

    mode = block_impl(B, L, D, num_heads, hidden, jnp.dtype(dtype), attn_impl)
    if mode == "split_pad":
        # sub-lane stack (JEPA predictor D=96): pad the features to the
        # 128-lane tile ONCE for the whole stack instead of per block —
        # the per-block pad/slice pairs (2·depth relayout copies at
        # B·L·128) disappear; kernels and numerics identical to Block's
        # split_pad branch (LN statistics over d_real inside the kernel)
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import (
            fused_attn_branch,
            fused_mlp_branch,
            pad_attn_branch_params,
            pad_mlp_branch_params,
        )

        pad = 128 - D
        xp = jnp.pad(x.astype(dtype), ((0, 0), (0, 0), (0, pad)))
        for p in params:
            ap = pad_attn_branch_params(*p[:6], pad)
            mp = pad_mlp_branch_params(*p[6:], pad)
            xp = fused_attn_branch(xp, *ap, num_heads, d_real=D)
            xp = fused_mlp_branch(xp, *mp, d_real=D)
        return xp[..., :D]
    # parent=None: detached module — params are INJECTED via apply, the
    # declaration above (param_mods) is the single source of truth
    blk = Block(dim, num_heads, mlp_ratio, dtype=dtype, attn_impl=attn_impl,
                parent=None)
    for p in params:
        x = blk.apply({"params": _block_tree(p)}, x)
    return x


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import (
            block_impl,
            fused_attn_branch,
            fused_block,
            fused_mlp_branch,
        )

        B, L, D = x.shape
        hidden = int(self.dim * self.mlp_ratio)
        mode = block_impl(B, L, D, self.num_heads, hidden, x.dtype, self.attn_impl)
        if mode is not None:
            # fused-block Pallas kernels: sub-layer boundaries stay in VMEM,
            # backward rematerializes in VMEM, weight grads accumulate in
            # fp32 across the grid — kills the inter-op HBM round-trips and
            # layout copies that dominate at small per-chip batch
            # (docs/PERFORMANCE.md round-2 profile). "split" (production)
            # fuses each residual branch separately so attention scores are
            # built exactly once per pass; "mono" (ablation) fuses the whole
            # block. Param tree is identical to the sub-module path below
            # (checkpoint/freeze/torch-interop compatible).
            s1, b1 = _LNParams(D, name="norm1")()
            (wqkv, bqkv), (wp, bp) = _AttnParams(D, name="attn")()
            s2, b2 = _LNParams(D, name="norm2")()
            (w1, b1f), (w2, b2f) = _MlpParams(D, hidden, name="mlp")()
            x = x.astype(self.dtype)
            if mode == "mono":
                return fused_block(
                    x, s1, b1, wqkv, bqkv, wp, bp,
                    s2, b2, w1, b1f, w2, b2f, self.num_heads,
                )
            if mode == "split_pad":
                # sub-lane model dim (e.g. JEPA predictor D=96): zero-pad
                # features to the 128-lane tile and run the proven D>=128
                # split kernels — the MXU pads lanes to 128 regardless, so
                # the extra columns are free; LN statistics use the real D
                # inside the kernel (d_real) and the pad/slice pair is a
                # cheap fused copy (ops/block_pallas.py policy docstring)
                from ssrl_vit_mae_jepa_tpu.ops.block_pallas import (
                    pad_attn_branch_params,
                    pad_mlp_branch_params,
                )

                pad = 128 - D
                xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
                ap = pad_attn_branch_params(s1, b1, wqkv, bqkv, wp, bp, pad)
                mp = pad_mlp_branch_params(s2, b2, w1, b1f, w2, b2f, pad)
                xp = fused_attn_branch(xp, *ap, self.num_heads, d_real=D)
                xp = fused_mlp_branch(xp, *mp, d_real=D)
                return xp[..., :D]
            x = fused_attn_branch(x, s1, b1, wqkv, bqkv, wp, bp, self.num_heads)
            return fused_mlp_branch(x, s2, b2, w1, b1f, w2, b2f)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.dim, self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn",
        )(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp"
        )(y)
        return x


class VisionTransformer(nn.Module):
    """Tokens-out ViT (timm ``num_classes=0`` contract)."""

    img_size: int = 96
    patch_size: int = 8
    in_chans: int = 3
    embed_dim: int = 144
    depth: int = 4
    num_heads: int = 6
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def sequence_length(self) -> int:
        return self.num_patches + 1

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, idx_keep: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """(B, H, W, C) images → (B, L', D) normed tokens.

        With ``idx_keep`` (B, K): the lightly masked-encode path — gather the
        kept tokens *after* adding positional embeddings, then run the blocks
        on the K-token sequence. Without it: timm ``forward_features``.

        ``images`` may also be pre-patchified (B, N, p·p·C) tokens (ndim 3)
        — the train path computes them fused with the augmentation
        (``ops/augment.py::apply_augment_patches``) so the image tensor and
        its relayout copies never materialize; patchify-then-cast and
        cast-then-patchify are elementwise-identical.
        """
        B = images.shape[0]
        D = self.embed_dim

        patches = (
            images.astype(self.dtype)
            if images.ndim == 3
            else patchify(images.astype(self.dtype), self.patch_size)
        )
        Pc = patches.shape[-1]
        w_pe, b_pe = _PatchEmbedParams(D, name="patch_embed")(Pc)

        cls_token = self.param("cls_token", trunc_normal_init, (1, 1, D), jnp.float32)
        pos_embed = self.param(
            "pos_embed", trunc_normal_init, (1, self.sequence_length, D), jnp.float32
        )
        from ssrl_vit_mae_jepa_tpu.ops.embed_pallas import (
            fused_patch_embed, use_fused_embed,
        )

        K = None if idx_keep is None else idx_keep.shape[-1]
        if use_fused_embed(
            _platform(), B, self.num_patches, Pc, D, K
        ):
            # embed GEMM + CLS + pos + mask gather in one VMEM pass: only
            # the (B, K, D) kept tokens ever reach HBM (env-gated;
            # ops/embed_pallas.py)
            x = fused_patch_embed(
                patches, w_pe, b_pe, cls_token, pos_embed, idx_keep
            )
        else:
            # unfused chain — computes exactly what nn.Dense(dtype) did
            x = _dot_dense(patches, w_pe, b_pe, self.dtype)
            cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, D))
            x = jnp.concatenate([cls, x], axis=1)
            x = x + pos_embed.astype(self.dtype)
            if idx_keep is not None:
                # one-hot-matmul backward: the gather VJP is a scatter-add
                # into (B, L, D); as an MXU contraction it is ~1.5 ms/step
                # cheaper at B=384 than XLA's scatter (docs/PERFORMANCE.md)
                x = get_at_index_mm(x, idx_keep)

        hidden = int(D * self.mlp_ratio)
        param_mods = [
            _BlockParams(D, hidden, name=f"blocks_{i}") for i in range(self.depth)
        ]
        x = run_block_stack(
            x, param_mods, D, self.num_heads, self.mlp_ratio,
            self.dtype, self.attn_impl,
        )

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x


def vit_from_config(model_cfg: dict, dtype=jnp.bfloat16, attn_impl: str = "auto"):
    """Build a VisionTransformer from the reference YAML ``model`` section."""
    general = model_cfg.get("general", {})
    enc = model_cfg.get("encoder", {})
    return VisionTransformer(
        img_size=general.get("image_size", 96),
        patch_size=general.get("patch_size", 8),
        in_chans=general.get("in_chans", 3),
        embed_dim=enc.get("embed_dim", 144),
        depth=enc.get("depth", 4),
        num_heads=enc.get("num_heads", 6),
        dtype=dtype,
        attn_impl=attn_impl,
    )
