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
        """Whole ViT with impl='packed' (interpret) ≡ impl='xla'."""
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
