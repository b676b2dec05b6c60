"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ssrl_vit_mae_jepa_tpu.ops.attention import mha_xla, multi_head_attention
from ssrl_vit_mae_jepa_tpu.ops import attention_pallas


def _rand(shape, seed=0, dtype=jnp.float32):
    k = jax.random.PRNGKey(seed)
    return jax.random.normal(k, shape, dtype)


@pytest.mark.parametrize("B,H,L,d", [(4, 6, 37, 24), (2, 6, 145, 32), (3, 2, 17, 8)])
def test_pallas_forward_matches_xla(B, H, L, d):
    q, k, v = (_rand((B, H, L, d), s) for s in range(3))
    ref = mha_xla(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = attention_pallas.mha_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_backward_matches_xla():
    B, H, L, d = 2, 3, 37, 24
    q, k, v = (_rand((B, H, L, d), s) for s in range(3))
    g = _rand((B, H, L, d), 7)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) * g)
        return f

    ref_grads = jax.grad(loss(mha_xla), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        pal_grads = jax.grad(loss(attention_pallas.mha_pallas), argnums=(0, 1, 2))(
            q, k, v
        )
    for a, b in zip(ref_grads, pal_grads):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_supported_shapes():
    assert attention_pallas.supported(4096, 6, 145, 32, "bfloat16")
    assert attention_pallas.supported(4096, 6, 37, 24, "float32")
    assert not attention_pallas.supported(1, 1, 4096, 24, "bfloat16")  # L too big
    assert not attention_pallas.supported(4, 6, 145, 24, "float16")


def test_dispatcher_xla_fallback_off_tpu():
    q, k, v = (_rand((2, 2, 37, 8), s) for s in range(3))
    out = multi_head_attention(q, k, v, impl="auto")  # CPU → XLA path
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mha_xla(q, k, v)), atol=1e-6
    )


def _ref_natural(q, k, v, H):
    B, L, D = q.shape
    d = D // H
    r = lambda x: x.reshape(B, L, H, d).transpose(0, 2, 1, 3)  # noqa: E731
    o = mha_xla(r(q), r(k), r(v))
    return o.transpose(0, 2, 1, 3).reshape(B, L, D)


class TestPackedKernel:
    """Slot-packed natural-layout kernel (interpret mode on CPU)."""

    @pytest.mark.parametrize("B,L,H,d", [(2, 145, 6, 32), (3, 37, 6, 24),
                                         (2, 17, 2, 8)])
    def test_forward(self, B, L, H, d):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_packed import mha_packed

        D = H * d
        q, k, v = (_rand((B, L, D), s) for s in range(3))
        ref = _ref_natural(q, k, v, H)
        with pltpu.force_tpu_interpret_mode():
            out = mha_packed(q, k, v, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_backward(self):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_packed import mha_packed

        B, L, H, d = 2, 37, 6, 24
        D = H * d
        q, k, v = (_rand((B, L, D), s) for s in range(3))
        g = _rand((B, L, D), 7)
        ref_grads = jax.grad(
            lambda a, b, c: jnp.sum(_ref_natural(a, b, c, H) * g), argnums=(0, 1, 2)
        )(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            pal_grads = jax.grad(
                lambda a, b, c: jnp.sum(mha_packed(a, b, c, H) * g),
                argnums=(0, 1, 2),
            )(q, k, v)
        for a, b in zip(ref_grads, pal_grads):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    def test_model_forced_packed_matches_xla(self, rng):
        """Whole ViT with impl='packed' (interpret) ≡ impl='xla'.

        NOTE impl='packed' dispatches to the head-STACKED kernel
        (ops/attention.py use_packed → mha_stacked_qkv) — the legacy
        slot-packed kernel (attention_pallas_packed) is reachable only by
        direct call and is covered by the direct fwd/bwd tests above; this
        test pins the model-level dispatch path for the forced string."""
        from ssrl_vit_mae_jepa_tpu.models.vit import VisionTransformer

        x = _rand((2, 32, 32, 3), 5)
        vit_x = VisionTransformer(img_size=32, patch_size=8, embed_dim=48,
                                  depth=1, num_heads=4, dtype=jnp.float32,
                                  attn_impl="xla")
        params = vit_x.init(rng, x)
        ref = vit_x.apply(params, x)
        vit_p = VisionTransformer(img_size=32, patch_size=8, embed_dim=48,
                                  depth=1, num_heads=4, dtype=jnp.float32,
                                  attn_impl="packed")
        with pltpu.force_tpu_interpret_mode():
            out = vit_p.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestStackedKernel:
    """Direct parity for the PRODUCTION head-stacked kernel (mha_stacked).

    The model's production shapes are the masked-encoder sequence
    (L=37, H=6, d=24) and the decoder/classifier sequence (L=145, H=6,
    d=32); both are covered forward AND backward, in fp32 and bf16
    (interpret mode on CPU; real-TPU numerics are covered by
    tests/smoke_tpu.py and training convergence in docs/RESULTS.md).
    """

    # includes the JEPA-predictor sub-lane-tile shape (L=145, H=6, d=16):
    # auto routes it through mha_stacked's split-q/k/v entry
    # (ops.attention.use_stacked_split) with G pinned to 1
    PROD_SHAPES = [(2, 37, 6, 24), (2, 145, 6, 32), (3, 17, 2, 8),
                   (2, 145, 6, 16)]

    @pytest.mark.parametrize("B,L,H,d", PROD_SHAPES)
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward(self, B, L, H, d, dtype):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import mha_stacked

        D = H * d
        q, k, v = (_rand((B, L, D), s, dtype) for s in range(3))
        ref = _ref_natural(q, k, v, H)
        with pltpu.force_tpu_interpret_mode():
            out = mha_stacked(q, k, v, H)
        atol = 2e-5 if dtype == jnp.float32 else 1e-2
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
        )

    @pytest.mark.parametrize("B,L,H,d", PROD_SHAPES)
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_backward(self, B, L, H, d, dtype):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import mha_stacked

        D = H * d
        q, k, v = (_rand((B, L, D), s, dtype) for s in range(3))
        g = _rand((B, L, D), 7, dtype)
        ref_grads = jax.grad(
            lambda a, b, c: jnp.sum(_ref_natural(a, b, c, H) * g), argnums=(0, 1, 2)
        )(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            pal_grads = jax.grad(
                lambda a, b, c: jnp.sum(mha_stacked(a, b, c, H) * g),
                argnums=(0, 1, 2),
            )(q, k, v)
        # bf16 tolerance: both sides accumulate dots in fp32, but P/dS are
        # rounded to bf16 before the second GEMM; measured max abs error at
        # these shapes is ≤0.016 (unit-normal inputs).
        atol = 1e-4 if dtype == jnp.float32 else 2.5e-2
        for name, a, b in zip("qkv", ref_grads, pal_grads):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32),
                atol=atol, err_msg=f"d{name} mismatch at L={L} d={d} {dtype}",
            )

    @pytest.mark.parametrize("B,L,H,d", [(2, 37, 6, 24), (2, 145, 6, 32),
                                         (4, 17, 2, 8)])
    def test_fused_qkv_forward_and_backward(self, B, L, H, d):
        """mha_stacked_qkv (the production fused-input path): forward and
        every gradient matches the three-input reference; B=4 exercises the
        multi-image (G>1) grid grouping."""
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import (
            mha_stacked_qkv,
        )

        D = H * d
        qkv = _rand((B, L, 3 * D), 3)
        g = _rand((B, L, D), 7)

        def ref_loss(qkv):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return jnp.sum(_ref_natural(q, k, v, H) * g)

        def fused_loss(qkv):
            return jnp.sum(mha_stacked_qkv(qkv, H) * g)

        with pltpu.force_tpu_interpret_mode():
            out = mha_stacked_qkv(qkv, H)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref_natural(q, k, v, H)), atol=2e-5
        )
        ref_grad = jax.grad(ref_loss)(qkv)
        with pltpu.force_tpu_interpret_mode():
            fused_grad = jax.grad(fused_loss)(qkv)
        np.testing.assert_allclose(
            np.asarray(fused_grad), np.asarray(ref_grad), atol=1e-4
        )

    def test_supported_boundaries(self):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import supported

        # production shapes (B, H, L, D=H*d)
        assert supported(2048, 6, 37, 144, "bfloat16")
        assert supported(2048, 6, 145, 192, "float32")
        assert not supported(4, 6, 37, 100, "bfloat16")   # D % H != 0
        assert not supported(4, 4, 2048, 64, "bfloat16")  # L > 1024
        assert not supported(4, 6, 1024, 144, "bfloat16")  # H*L > 4096
        assert not supported(4, 6, 145, 192, "float16")   # unsupported dtype
        assert not supported(4, 4, 1000, 512, "float32")  # VMEM working set

    def test_whole_mae_backward_forced_stacked(self, rng):
        """Gradients of the full MAE loss: forced-stacked ≡ XLA attention."""
        from ssrl_vit_mae_jepa_tpu.models.mae import MaskedAutoencoder
        from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask

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
        mae_s = MaskedAutoencoder(attn_impl="packed", **kw)
        with pltpu.force_tpu_interpret_mode():
            stacked_grads = jax.grad(loss)(params, mae_s)

        flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
        flat_st = jax.tree_util.tree_leaves(stacked_grads)
        assert len(flat_ref) == len(flat_st)
        for (path, a), b in zip(flat_ref, flat_st):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-5,
                err_msg=jax.tree_util.keystr(path),
            )


class TestImplValidation:
    def test_unknown_impl_rejected(self):
        """A typo'd attn_impl must raise, not silently behave as auto (a
        parity check forcing 'XLA' would otherwise get the kernel under
        test instead of the reference path)."""
        import jax.numpy as jnp
        import pytest

        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import block_impl

        with pytest.raises(ValueError, match="unknown attn_impl"):
            block_impl(4, 145, 144, 6, 576, jnp.bfloat16, "XLA")
        with pytest.raises(ValueError, match="unknown attn_impl"):
            block_impl(4, 145, 144, 6, 576, jnp.bfloat16, "spit")


class TestHeadGroupSplit:
    """Head-group-split attention core (SSRL_ATTN_GROUPED=1): identical
    numerics to the full-width form — cross-slot products are exact zeros —
    with ~half the MXU K-passes on the D=192 decoder geometry."""

    def test_head_groups_policy(self):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import (
            _head_groups,
        )

        # decoder: slots 0..128 (heads 0-3) and 128..192 (heads 4-5)
        assert _head_groups(6, 32, 192) == [(0, 4, 0, 128), (4, 6, 128, 192)]
        # encoder: head 5's slot crosses the 128 boundary → no split
        assert _head_groups(6, 24, 144) is None
        # single tile → no split needed
        assert _head_groups(6, 16, 128) is None
        assert _head_groups(4, 8, 32) is None
        # 2 tiles, 2 heads, aligned
        assert _head_groups(2, 128, 256) == [(0, 1, 0, 128), (1, 2, 128, 256)]

    def test_head_groups_any_policy(self):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import (
            _grouped,
            _head_groups_any,
        )

        # encoder: unaligned spans of 120 and 24 cols — each one tile
        assert _head_groups_any(6, 24, 144) == [(0, 5, 0, 120), (5, 6, 120, 144)]
        # decoder: greedy reproduces the aligned split
        assert _head_groups_any(6, 32, 192) == [(0, 4, 0, 128), (4, 6, 128, 192)]
        assert _head_groups_any(6, 16, 96) is None  # single tile
        assert _head_groups_any(2, 192, 384) is None  # slot wider than a tile
        # env dispatch: 1 = aligned only, 2 = aligned else any-offset
        import os

        os.environ["SSRL_ATTN_GROUPED"] = "1"
        try:
            assert _grouped(6, 24, 144) is None
            assert _grouped(6, 32, 192) is not None
            os.environ["SSRL_ATTN_GROUPED"] = "2"
            assert _grouped(6, 24, 144) == [(0, 5, 0, 120), (5, 6, 120, 144)]
            assert _grouped(6, 32, 192) == [(0, 4, 0, 128), (4, 6, 128, 192)]
        finally:
            os.environ.pop("SSRL_ATTN_GROUPED", None)

    @pytest.mark.parametrize("B,H,L,d,flag", [
        (2, 6, 145, 32, "1"), (2, 2, 16, 128, "1"),
        (2, 6, 145, 24, "2"),  # encoder geometry via the unaligned split
        (2, 6, 37, 24, "2"),
    ])
    def test_grouped_stacked_matches_xla(self, B, H, L, d, flag, monkeypatch):
        from ssrl_vit_mae_jepa_tpu.ops.attention_pallas_stacked import (
            mha_stacked,
        )

        monkeypatch.setenv("SSRL_ATTN_GROUPED", flag)
        D = H * d
        q, k, v = (_rand((B, L, D), s) for s in range(3))
        g = _rand((B, L, D), 7)
        ref = _ref_natural(q, k, v, H)

        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v) * g)

        with pltpu.force_tpu_interpret_mode():
            out = mha_stacked(q, k, v, H)
            grads = jax.grad(
                loss(lambda q, k, v: mha_stacked(q, k, v, H)),
                argnums=(0, 1, 2),
            )(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        ref_grads = jax.grad(
            loss(lambda q, k, v: _ref_natural(q, k, v, H)), argnums=(0, 1, 2)
        )(q, k, v)
        for a, b in zip(ref_grads, grads):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    def test_grouped_fused_block_matches_ungrouped(self, monkeypatch):
        """The production fused attn-branch kernel, grouped vs baseline,
        bitwise-comparable numerics at the decoder shape."""
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import fused_attn_branch

        B, L, D, H = 8, 145, 192, 6
        x = _rand((B, L, D), 1)
        params = [
            jnp.ones((D,)), jnp.zeros((D,)),               # ln scale/bias
            _rand((D, 3 * D), 2) * 0.05, jnp.zeros((3 * D,)),
            _rand((D, D), 3) * 0.05, jnp.zeros((D,)),
        ]
        g = _rand((B, L, D), 9)

        def run():
            def f(x, *p):
                return jnp.sum(fused_attn_branch(x, *p, H) * g)

            with pltpu.force_tpu_interpret_mode():
                out = fused_attn_branch(x, *params, H)
                grads = jax.grad(f, argnums=(0, 1, 3, 5))(x, *params)
            return out, grads

        monkeypatch.setenv("SSRL_ATTN_GROUPED", "0")
        base_out, base_grads = run()
        for flag in ("1", "2"):
            monkeypatch.setenv("SSRL_ATTN_GROUPED", flag)
            grp_out, grp_grads = run()
            np.testing.assert_allclose(
                np.asarray(grp_out), np.asarray(base_out), atol=1e-5)
            for a, b in zip(base_grads, grp_grads):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=2e-5)

    def test_grouped2_fused_block_encoder_matches_ungrouped(self, monkeypatch):
        """SSRL_ATTN_GROUPED=2 activates the unaligned split on the D=144
        encoder geometry — the shape every task runs."""
        from ssrl_vit_mae_jepa_tpu.ops.block_pallas import fused_attn_branch

        B, L, D, H = 8, 37, 144, 6
        x = _rand((B, L, D), 1)
        params = [
            jnp.ones((D,)), jnp.zeros((D,)),
            _rand((D, 3 * D), 2) * 0.05, jnp.zeros((3 * D,)),
            _rand((D, D), 3) * 0.05, jnp.zeros((D,)),
        ]
        g = _rand((B, L, D), 9)

        def run():
            def f(x, *p):
                return jnp.sum(fused_attn_branch(x, *p, H) * g)

            with pltpu.force_tpu_interpret_mode():
                out = fused_attn_branch(x, *params, H)
                grads = jax.grad(f, argnums=(0, 1, 3, 5))(x, *params)
            return out, grads

        monkeypatch.setenv("SSRL_ATTN_GROUPED", "0")
        base_out, base_grads = run()
        monkeypatch.setenv("SSRL_ATTN_GROUPED", "2")
        grp_out, grp_grads = run()
        np.testing.assert_allclose(
            np.asarray(grp_out), np.asarray(base_out), atol=1e-5)
        for a, b in zip(base_grads, grp_grads):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
