"""Fused patch-embed prologue vs the unfused chain (interpret mode on CPU).

Covers ops/embed_pallas.fused_patch_embed — the embed GEMM + CLS + pos-embed
+ mask-gather fusion (reference chain: ``src/models/mae.py:85`` via lightly
``MaskedVisionTransformerTIMM.encode`` / timm ``PatchEmbed``) — forward and
backward, with and without ``idx_keep``, plus the whole-ViT dispatch under
``SSRL_FUSED_EMBED=force``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ssrl_vit_mae_jepa_tpu.ops.embed_pallas import (
    embed_supported,
    fused_patch_embed,
    use_fused_embed,
)


def _rand(shape, seed=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype)


def _ref_chain(patches, w, b, cls, pos, idx_keep):
    """The exact unfused computation (models/vit.py unfused branch)."""
    dtype = patches.dtype
    B = patches.shape[0]
    D = w.shape[-1]
    x = jnp.dot(patches, w.astype(dtype)) + b.astype(dtype)
    clsb = jnp.broadcast_to(cls.reshape(1, 1, D).astype(dtype), (B, 1, D))
    x = jnp.concatenate([clsb, x], axis=1)
    x = x + pos.reshape(1, -1, D).astype(dtype)
    if idx_keep is not None:
        x = jnp.take_along_axis(x, idx_keep[..., None].astype(jnp.int32), axis=1)
    return x


def _operands(B, N, Pc, D, K, dtype=jnp.float32, seed=0):
    patches = _rand((B, N, Pc), seed, dtype)
    w = _rand((Pc, D), seed + 1) * 0.05
    b = _rand((D,), seed + 2) * 0.05
    cls = _rand((1, 1, D), seed + 3) * 0.02
    pos = _rand((1, N + 1, D), seed + 4) * 0.02
    idx = None
    if K is not None:
        ks = []
        for i in range(B):
            kept = jax.random.permutation(
                jax.random.PRNGKey(seed + 5 + i), N
            )[: K - 1] + 1
            ks.append(jnp.concatenate([jnp.zeros(1, jnp.int32),
                                       jnp.sort(kept).astype(jnp.int32)]))
        idx = jnp.stack(ks)
    return patches, w, b, cls, pos, idx


# (B, N, Pc, D, K): grid>1 groups at B=16; production encoder geometry
# (N=144, Pc=192, D=144, K=37) scaled to B=8 for interpret-mode speed.
SHAPES = [
    (8, 144, 192, 144, 37),
    (8, 144, 192, 144, None),
    (16, 16, 128, 128, 5),
    (16, 16, 128, 128, None),
]


@pytest.mark.parametrize("B,N,Pc,D,K", SHAPES)
def test_forward_matches_unfused(B, N, Pc, D, K):
    patches, w, b, cls, pos, idx = _operands(B, N, Pc, D, K)
    ref = _ref_chain(patches, w, b, cls, pos, idx)
    with pltpu.force_tpu_interpret_mode():
        out = fused_patch_embed(patches, w, b, cls, pos, idx)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("B,N,Pc,D,K", [SHAPES[0], SHAPES[3]])
def test_backward_matches_unfused(B, N, Pc, D, K):
    patches, w, b, cls, pos, idx = _operands(B, N, Pc, D, K)
    g = _rand((B, K if K is not None else N + 1, D), 11)

    def loss(fn):
        def f(patches, w, b, cls, pos):
            return jnp.sum(fn(patches, w, b, cls, pos, idx) * g)
        return f

    ref = jax.grad(loss(_ref_chain), argnums=(0, 1, 2, 3, 4))(
        patches, w, b, cls, pos
    )
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss(fused_patch_embed), argnums=(0, 1, 2, 3, 4))(
            patches, w, b, cls, pos
        )
    for name, a, c in zip(("dpatches", "dw", "db", "dcls", "dpos"), ref, got):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), atol=5e-4, err_msg=name
        )


def test_bf16_forward_close():
    patches, w, b, cls, pos, idx = _operands(8, 144, 192, 144, 37)
    patches = patches.astype(jnp.bfloat16)
    ref = _ref_chain(patches, w, b, cls, pos, idx)
    with pltpu.force_tpu_interpret_mode():
        out = fused_patch_embed(patches, w, b, cls, pos, idx)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_policy():
    # sub-128 lane dims are the hard-fault class — must be refused
    assert not embed_supported(768, 144, 96, 144)
    assert not embed_supported(768, 144, 192, 96)
    assert embed_supported(768, 144, 192, 144, 37)
    assert embed_supported(768, 144, 192, 144, None)
    # gated off by default; 'force' skips only the platform check
    assert not use_fused_embed("tpu", 768, 144, 192, 144, 37)


def test_vit_dispatch_force(monkeypatch):
    """Whole ViT with the fused prologue (interpret) ≡ unfused, both the
    masked-encode and the full-sequence path."""
    from ssrl_vit_mae_jepa_tpu.models.vit import VisionTransformer

    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=128, depth=1, num_heads=4,
        attn_impl="xla",
    )
    images = _rand((8, 32, 32, 3), 3)
    idx = _operands(8, 16, 192, 128, 5)[-1]
    params = model.init(jax.random.PRNGKey(0), images)
    ref_m = model.apply(params, images, idx)
    ref_f = model.apply(params, images)
    monkeypatch.setenv("SSRL_FUSED_EMBED", "force")
    with pltpu.force_tpu_interpret_mode():
        out_m = model.apply(params, images, idx)
        out_f = model.apply(params, images)
    # the fused path folds cls+pos in fp32 where the unfused chain rounds
    # each to bf16 first — a one-ULP input difference the block can double
    np.testing.assert_allclose(
        np.asarray(out_m, np.float32), np.asarray(ref_m, np.float32), atol=7e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(ref_f, np.float32), atol=7e-2
    )
