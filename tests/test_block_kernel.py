"""Fused whole-Block Pallas kernel vs the per-sub-layer flax path.

The fused kernel (``ops/block_pallas.py``) is the production TPU path for
every transformer block (encoder, decoder, classifier, JEPA); these tests
pin it — forward AND backward, at the production shapes, in fp32 and bf16 —
to the flax module path it replaces (which is itself pinned to an
independent torch golden in tests/test_interop.py). Interpret mode on CPU;
real-TPU numerics are exercised by tests/smoke_tpu.py and the training runs
in docs/RESULTS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ssrl_vit_mae_jepa_tpu.models.vit import Block


def _rand(shape, seed, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype)


# (B, L, D, H): MAE encoder/decoder geometries, an odd small shape (G=1
# path), and the JEPA target/context encoder shapes (L=145/45 at D=144)
PROD_SHAPES = [
    (4, 37, 144, 6),
    (2, 145, 192, 6),
    (3, 17, 48, 4),
    (2, 145, 144, 6),
    (2, 45, 144, 6),
]

# Sub-lane model dims (D < 128) for the lane-padded split route
# ("split_pad"): the JEPA predictor (D=96, the production user), plus a
# small odd shape exercising the whole-batch fallback group
PAD_SHAPES = [
    (4, 145, 96, 6),
    (2, 45, 96, 6),
    (3, 17, 48, 4),
]


class TestFusedBlock:
    def test_param_tree_identical(self):
        """The fused branch declares the exact flax param tree (checkpoint,
        freeze-mask and torch-interop compatibility)."""
        x = _rand((2, 17, 48), 0)
        ref = Block(48, 4, dtype=jnp.float32, attn_impl="xla")
        fused = Block(48, 4, dtype=jnp.float32, attn_impl="block")
        p_ref = ref.init(jax.random.PRNGKey(1), x)
        with pltpu.force_tpu_interpret_mode():
            p_fused = fused.init(jax.random.PRNGKey(1), x)
        ref_flat = jax.tree_util.tree_leaves_with_path(p_ref)
        fused_flat = jax.tree_util.tree_leaves_with_path(p_fused)
        assert [jax.tree_util.keystr(p) for p, _ in ref_flat] == [
            jax.tree_util.keystr(p) for p, _ in fused_flat
        ]
        for (path, a), (_, b) in zip(ref_flat, fused_flat):
            assert a.shape == b.shape and a.dtype == b.dtype, jax.tree_util.keystr(path)
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(path)
            )

    @pytest.mark.parametrize("impl", ["block", "split"])
    @pytest.mark.parametrize("B,L,D,H", PROD_SHAPES)
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward(self, B, L, D, H, dtype, impl):
        x = _rand((B, L, D), 0, dtype)
        ref = Block(D, H, dtype=dtype, attn_impl="xla")
        fused = Block(D, H, dtype=dtype, attn_impl=impl)
        params = ref.init(jax.random.PRNGKey(1), x)
        out_ref = ref.apply(params, x)
        with pltpu.force_tpu_interpret_mode():
            out = fused.apply(params, x)
        atol = 5e-5 if dtype == jnp.float32 else 6e-2
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(out_ref, np.float32), atol=atol
        )

    @pytest.mark.parametrize("impl", ["block", "split"])
    @pytest.mark.parametrize("B,L,D,H", PROD_SHAPES)
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_backward_params_and_input(self, B, L, D, H, dtype, impl):
        """Every weight gradient + the input gradient match the flax path,
        for BOTH fused forms: 'block' (mono, ablation) and 'split' (the
        production attn-branch + mlp-branch kernels with their fp32 grid
        accumulators)."""
        x = _rand((B, L, D), 0, dtype)
        g = _rand((B, L, D), 7, dtype)
        ref = Block(D, H, dtype=dtype, attn_impl="xla")
        fused = Block(D, H, dtype=dtype, attn_impl=impl)
        params = ref.init(jax.random.PRNGKey(1), x)

        def loss(mod):
            return lambda p, x: jnp.sum(
                mod.apply(p, x).astype(jnp.float32) * g.astype(jnp.float32)
            )

        ref_g = jax.grad(loss(ref), argnums=(0, 1))(params, x)
        with pltpu.force_tpu_interpret_mode():
            fused_g = jax.grad(loss(fused), argnums=(0, 1))(params, x)
        # fp32: accumulation-order noise only. bf16: both paths round
        # activations to bf16 between GEMMs, so sum-reduced bias grads
        # (up to B·L≈300 cancelling O(1) terms) differ by accumulated bf16
        # quantization — measured ≤0.32 abs; correctness is pinned by the
        # fp32 variant at 3e-4.
        atol = 3e-4 if dtype == jnp.float32 else 5e-1
        rtol = 1e-6 if dtype == jnp.float32 else 5e-2
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
        flat_fused = jax.tree_util.tree_leaves(fused_g)
        assert len(flat_ref) == len(flat_fused)
        for (path, a), b in zip(flat_ref, flat_fused):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32),
                atol=atol, rtol=rtol,
                err_msg=f"{jax.tree_util.keystr(path)} at L={L} D={D} {dtype}",
            )

    @pytest.mark.parametrize("B,L,D,H", PAD_SHAPES)
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward_split_pad(self, B, L, D, H, dtype):
        """Lane-padded split kernels (sub-lane D zero-padded to 128, LN over
        d_real) match the flax path — the production route for the JEPA
        predictor after the D<128 Mosaic fault (docs/PERFORMANCE.md)."""
        x = _rand((B, L, D), 0, dtype)
        ref = Block(D, H, dtype=dtype, attn_impl="xla")
        fused = Block(D, H, dtype=dtype, attn_impl="split_pad")
        params = ref.init(jax.random.PRNGKey(1), x)
        out_ref = ref.apply(params, x)
        with pltpu.force_tpu_interpret_mode():
            out = fused.apply(params, x)
        atol = 5e-5 if dtype == jnp.float32 else 6e-2
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(out_ref, np.float32), atol=atol
        )

    @pytest.mark.parametrize("B,L,D,H", PAD_SHAPES)
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_backward_split_pad(self, B, L, D, H, dtype):
        """Every weight gradient + input gradient through the lane-padded
        split kernels matches the flax path (pad-column garbage must never
        contaminate real gradients — zero-padded weights guarantee it)."""
        x = _rand((B, L, D), 0, dtype)
        g = _rand((B, L, D), 7, dtype)
        ref = Block(D, H, dtype=dtype, attn_impl="xla")
        fused = Block(D, H, dtype=dtype, attn_impl="split_pad")
        params = ref.init(jax.random.PRNGKey(1), x)

        def loss(mod):
            return lambda p, x: jnp.sum(
                mod.apply(p, x).astype(jnp.float32) * g.astype(jnp.float32)
            )

        ref_g = jax.grad(loss(ref), argnums=(0, 1))(params, x)
        with pltpu.force_tpu_interpret_mode():
            fused_g = jax.grad(loss(fused), argnums=(0, 1))(params, x)
        atol = 3e-4 if dtype == jnp.float32 else 5e-1
        rtol = 1e-6 if dtype == jnp.float32 else 5e-2
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
        flat_fused = jax.tree_util.tree_leaves(fused_g)
        assert len(flat_ref) == len(flat_fused)
        for (path, a), b in zip(flat_ref, flat_fused):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32),
                atol=atol, rtol=rtol,
                err_msg=f"{jax.tree_util.keystr(path)} at L={L} D={D} {dtype}",
            )

    def test_erf_approximation(self):
        """In-kernel erf (A&S 7.1.26) matches jax.lax.erf to <1e-6."""
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import _erf

        x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(_erf(x)), np.asarray(jax.lax.erf(x)), atol=1e-6
        )

    def test_unsupported_raises_when_forced(self):
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import use_fused_block

        with pytest.raises(ValueError):
            use_fused_block(4, 37, 100, 6, 400, jnp.bfloat16, "block")  # D % H

    def test_supported_boundaries(self):
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import supported

        assert supported(384, 6, 37, 144, 576, "bfloat16")   # encoder
        assert supported(384, 6, 145, 192, 768, "bfloat16")  # decoder
        assert not supported(4, 6, 37, 100, 400, "bfloat16")    # D % H
        assert not supported(4, 4, 2048, 64, 256, "bfloat16")   # L too long
        assert not supported(4, 6, 145, 192, 768, "float16")    # dtype
        assert not supported(64, 8, 512, 1024, 4096, "float32")  # VMEM

    def test_split_supported_scales_vmem_with_flat_group(self):
        """The split guard sizes the live set with _flat_group's G (up to 24),
        not the mono G<=2 — an understated bound was ADVICE r2 finding #2."""
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import split_supported

        # production shapes at production batch pass
        assert split_supported(768, 6, 37, 144, 576, "bfloat16")
        assert split_supported(768, 6, 145, 192, 768, "bfloat16")
        assert split_supported(2048, 6, 145, 192, 768, "bfloat16")
        # no legal flat image group
        assert not split_supported(100, 6, 145, 144, 576, "bfloat16")
        # a shape whose flat live set (G=8 rows) blows the 32MB budget
        assert not split_supported(512, 8, 513, 1024, 4096, "bfloat16")

    def test_group_override_validation(self, monkeypatch):
        """Invalid SSRL_BLOCK_GROUP overrides fall back to the auto choice in
        BOTH helpers (a non-dividing G would silently drop the batch tail)."""
        from ssrl_vit_mae_jepa_tpu.ops import block_pallas as bp

        monkeypatch.setenv("SSRL_BLOCK_GROUP", "7")
        assert bp._group(768) == 2          # 768 % 7 != 0 → auto
        assert bp._flat_group(768, 145) == 8  # (7*145) % 8 != 0 → auto
        monkeypatch.setenv("SSRL_BLOCK_GROUP", "8")
        assert bp._group(768) == 8
        assert bp._flat_group(768, 145) == 8
        monkeypatch.setenv("SSRL_BLOCK_GROUP", "3")
        assert bp._group(768) == 3
        assert bp._flat_group(768, 145) == 8  # (3*145) % 8 != 0 → auto

        # a DISTINGUISHING legal override (16 != the auto choice 8) must be
        # honored — without this case the override path could be dead code
        monkeypatch.setenv("SSRL_BLOCK_GROUP", "16")
        assert bp._flat_group(768, 145) == 16

    def test_auto_policy_excludes_sublane_dims(self):
        """auto never runs D<128 RAW or head-dim<24 (TPU kernel fault shapes).

        Measured on v5e: the flat split kernels hard-fault the TPU worker at
        the JEPA-predictor shape (L=145, D=96, d=16) while every D=144/192
        shape passes. Sub-lane dims route to the lane-PADDED split kernels
        ("split_pad", D zero-padded to 128 — the proven configuration) on
        TPU, and to the sub-layer path on CPU.
        """
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import block_impl

        # JEPA predictor: D=96 < 128 — split_pad on TPU, None on CPU (this
        # test host); forcing split_pad works anywhere (interpret tests)
        assert block_impl(64, 145, 96, 6, 384, jnp.bfloat16, "auto") in (
            None, "split_pad",
        )
        assert block_impl(64, 145, 96, 6, 384, jnp.bfloat16, "split_pad") == "split_pad"
        # split_pad is only for sub-lane dims: D>=128 must raise when forced
        import pytest as _pt

        with _pt.raises(ValueError):
            block_impl(64, 145, 144, 6, 576, jnp.bfloat16, "split_pad")
        # no legal flat image group (B=100, L=145) → padded route unavailable
        with _pt.raises(ValueError):
            block_impl(100, 145, 96, 6, 384, jnp.bfloat16, "split_pad")
        # head dim 16 < 24 even with D >= 128
        assert block_impl(64, 145, 128, 8, 512, jnp.bfloat16, "auto") is None
        # same gate for the standalone stacked-attention auto policy
        from ssrl_vit_mae_jepa_tpu.ops.attention import (
            use_packed,
            use_stacked_split,
        )

        assert not use_packed(64, 145, 96, 6, jnp.bfloat16, "auto")
        # the split-input stacked kernel takes over D<128 on TPU; its policy
        # must never claim shapes use_packed accepts (production dims)
        assert not use_stacked_split(64, 145, 144, 6, jnp.bfloat16, "auto")
        assert not use_stacked_split(64, 145, 96, 6, jnp.bfloat16, "xla")
        # D>=128 with head dim < 24 (e.g. D=128/H=8) is claimed by NEITHER
        # stacked policy — those shapes run multi-image G from _group, a
        # configuration outside the hardware-validated envelope for the
        # fault class, so they must fall back to XLA
        assert not use_packed(64, 145, 128, 8, jnp.bfloat16, "auto")
        assert not use_stacked_split(64, 145, 128, 8, jnp.bfloat16, "auto")
        # production shapes unaffected (policy only; kernel choice still
        # requires a TPU backend at runtime)
        assert block_impl(384, 37, 144, 6, 576, jnp.bfloat16, "auto") in (None, "split")
        # no legal (G*L)%8==0 image group (e.g. B=100, L=145) → never split
        assert block_impl(100, 145, 144, 6, 576, jnp.bfloat16, "auto") is None
        import pytest as _pytest

        with _pytest.raises(ValueError):
            block_impl(100, 145, 144, 6, 576, jnp.bfloat16, "split")

    @pytest.mark.parametrize("impl", ["block", "split"])
    def test_whole_mae_backward_forced_block(self, impl):
        """Gradients of the full MAE loss: forced-fused-block ≡ XLA path."""
        from ssrl_vit_mae_jepa_tpu.models.mae import MaskedAutoencoder
        from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask

        rng = jax.random.PRNGKey(2)
        kw = dict(image_size=32, patch_size=8, embed_dim=48, depth=2,
                  num_heads=4, decoder_embed_dim=24, decoder_depth=1,
                  decoder_num_heads=2, dtype=jnp.float32)
        images = _rand((2, 32, 32, 3), 11)
        idx_keep, idx_mask = random_token_mask(jax.random.PRNGKey(3), 2, 17, 8)

        def loss(params, model):
            pred, target = model.apply(params, images, idx_keep, idx_mask)
            return jnp.mean((pred - target) ** 2)

        mae_x = MaskedAutoencoder(attn_impl="xla", **kw)
        params = mae_x.init(rng, images, idx_keep, idx_mask)
        ref_grads = jax.grad(loss)(params, mae_x)
        mae_b = MaskedAutoencoder(attn_impl=impl, **kw)
        with pltpu.force_tpu_interpret_mode():
            blk_grads = jax.grad(loss)(params, mae_b)

        flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
        flat_blk = jax.tree_util.tree_leaves(blk_grads)
        assert len(flat_ref) == len(flat_blk)
        for (path, a), b in zip(flat_ref, flat_blk):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4,
                err_msg=jax.tree_util.keystr(path),
            )


# (B, L, D, H, N): MAE encoder stack (depth 4), MAE decoder stack (depth 2),
# and the JEPA predictor stack (sub-lane D=96 → lane-padded chain route)
CHAIN_SHAPES = [
    (4, 37, 144, 6, 4),
    (2, 145, 192, 6, 2),
    (4, 45, 96, 6, 2),
]


class TestChainKernel:
    """Weight-resident multi-block chain kernel (``ops/block_chain.py``).

    Forced-only lineage: auto routing measured SLOWER than the per-block
    split kernels on v5e (see chain_impl docstring + docs/PERFORMANCE.md
    round-3 rejected-lever table), so ``attn_impl='chain'`` is the only
    way in. These tests pin forced-chain fwd+bwd — through the full
    ``VisionTransformer``/``run_block_stack`` machinery, exercising
    ``_BlockParams`` declaration + param injection — to the XLA path.
    """

    @pytest.mark.parametrize("B,L,D,H,N", [(4, 45, 96, 6, 2), (2, 145, 96, 6, 2)])
    def test_stack_pad_once_route(self, B, L, D, H, N):
        """run_block_stack's whole-stack lane-pad route (pad 96→128 once,
        slice once) matches the XLA path — the production JEPA-predictor
        stack layout."""
        from ssrl_vit_mae_jepa_tpu.models.vit import run_block_stack, _BlockParams
        import flax.linen as nn

        class Stack(nn.Module):
            attn_impl: str = "xla"

            @nn.compact
            def __call__(self, x):
                mods = [_BlockParams(D, 4 * D, name=f"blocks_{i}")
                        for i in range(N)]
                return run_block_stack(x, mods, D, H, 4.0, jnp.float32,
                                       self.attn_impl)

        x = _rand((B, L, D), 0)
        g = _rand((B, L, D), 7)
        ref = Stack("xla")
        params = ref.init(jax.random.PRNGKey(1), x)

        def loss(mod):
            return lambda p, x: jnp.sum(mod.apply(p, x) * g)

        out_ref = ref.apply(params, x)
        ref_g = jax.grad(loss(ref), argnums=(0, 1))(params, x)
        padded = Stack("split_pad")
        with pltpu.force_tpu_interpret_mode():
            out = padded.apply(params, x)
            pad_g = jax.grad(loss(padded), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=5e-5)
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves(pad_g),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-4, rtol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )

    @pytest.mark.parametrize("B,L,D,H,N", CHAIN_SHAPES)
    def test_stack_forward_backward(self, B, L, D, H, N):
        from ssrl_vit_mae_jepa_tpu.models.vit import run_block_stack, _BlockParams
        import flax.linen as nn

        class Stack(nn.Module):
            attn_impl: str = "xla"

            @nn.compact
            def __call__(self, x):
                mods = [_BlockParams(D, 4 * D, name=f"blocks_{i}")
                        for i in range(N)]
                return run_block_stack(x, mods, D, H, 4.0, jnp.float32,
                                       self.attn_impl)

        x = _rand((B, L, D), 0)
        g = _rand((B, L, D), 7)
        ref = Stack("xla")
        params = ref.init(jax.random.PRNGKey(1), x)

        def loss(mod):
            return lambda p, x: jnp.sum(mod.apply(p, x) * g)

        out_ref = ref.apply(params, x)
        ref_g = jax.grad(loss(ref), argnums=(0, 1))(params, x)
        chain = Stack("chain")
        with pltpu.force_tpu_interpret_mode():
            out = chain.apply(params, x)
            chain_g = jax.grad(loss(chain), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=5e-5)
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
        flat_chain = jax.tree_util.tree_leaves(chain_g)
        assert len(flat_ref) == len(flat_chain)
        for (path, a), b in zip(flat_ref, flat_chain):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-4, rtol=1e-5,
                err_msg=f"{jax.tree_util.keystr(path)} at L={L} D={D} N={N}",
            )

    def test_param_tree_matches_block_path(self):
        """run_block_stack's _BlockParams declaration produces the exact
        tree the per-Block path does (checkpoint/freeze/interop compat)."""
        from ssrl_vit_mae_jepa_tpu.models.vit import VisionTransformer

        kw = dict(img_size=32, patch_size=8, embed_dim=48, depth=2,
                  num_heads=4, dtype=jnp.float32)
        x = _rand((2, 32, 32, 3), 0)
        vit = VisionTransformer(attn_impl="xla", **kw)
        params = vit.init(jax.random.PRNGKey(1), x)
        names = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(params)]
        assert any("blocks_0" in n and "qkv" in n for n in names)
        assert any("blocks_1" in n and "fc2" in n for n in names)

    def test_auto_never_takes_chain(self):
        from ssrl_vit_mae_jepa_tpu.ops.block_chain import chain_impl

        # flagship shapes, TPU-eligible — still rejected in auto (measured
        # slower than split; forced-only lineage)
        assert chain_impl(768, 37, 144, 6, 576, 4, jnp.bfloat16, "auto") == (False, None)
        assert chain_impl(768, 145, 192, 6, 768, 2, jnp.bfloat16, "auto") == (False, None)
        # forcing works for supported shapes, raises otherwise
        ok, d_real = chain_impl(64, 145, 96, 6, 384, 2, jnp.bfloat16, "chain")
        assert ok and d_real == 96
        with pytest.raises(ValueError):
            chain_impl(64, 145, 100, 6, 400, 2, jnp.bfloat16, "chain")  # D % H
        with pytest.raises(ValueError):
            chain_impl(64, 145, 144, 6, 576, 1, jnp.bfloat16, "chain")  # depth


class TestChainPolicy:
    def test_chain_vmem_bound_scales_with_depth(self):
        """chain_impl's guard must size the live set with ALL N resident
        weight sets + fp32 grad accumulators + 3N−1 stash blocks — not the
        single-branch split bound (which would pass depths that blow the
        64 MB kernel VMEM limit on hardware)."""
        import jax.numpy as jnp

        from ssrl_vit_mae_jepa_tpu.ops.block_chain import chain_impl

        # production stacks fit
        assert chain_impl(768, 145, 192, 6, 768, 2, jnp.bfloat16, "chain")[0]
        assert chain_impl(2000, 145, 144, 6, 576, 4, jnp.bfloat16, "chain")[0]
        assert chain_impl(64, 145, 96, 6, 384, 2, jnp.bfloat16, "chain") == (True, 96)
        # same per-branch shape at depth 12: ~10.6 MB weights + 21 MB fp32
        # accumulators + ~15.6 MB stash blow the budget -> must refuse
        with pytest.raises(ValueError):
            chain_impl(768, 145, 192, 6, 768, 12, jnp.bfloat16, "chain")
