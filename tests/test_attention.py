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
