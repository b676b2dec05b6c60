"""Per-sample random token masking and batched token gather/scatter.

TPU-native replacement for ``lightly.models.utils.{random_token_mask,
get_at_index, set_at_index, repeat_token}`` (used at reference
``src/models/mae.py:61-83``). Everything is static-shaped for XLA: the number
of masked tokens is a **Python int** derived from the mask ratio, so a
mask-ratio ramp re-specializes the jitted step once per distinct ratio
(5 ratios for the reference's 5-epoch ramp — cheap) instead of using dynamic
shapes that would fall off the MXU path.

Contract (reference lightly 1.5.22 semantics, SURVEY.md §2.2):
- indices are token-space (CLS offset included); CLS (index 0) is never
  masked and always kept;
- ``num_masked = int(mask_ratio * (L - 1))`` over an L-token sequence;
- masking is a per-sample uniform random permutation of tokens ``1..L-1``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def num_masked_tokens(sequence_length: int, mask_ratio: float) -> int:
    """Static count of masked tokens (CLS excluded from the pool)."""
    return int(mask_ratio * (sequence_length - 1))


def random_token_mask(
    rng: jax.Array,
    batch_size: int,
    sequence_length: int,
    num_masked: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample uniform random token masking with CLS pinned to *keep*.

    Returns ``(idx_keep, idx_mask)`` of shapes ``(B, L - num_masked)`` and
    ``(B, num_masked)``; ``idx_keep[:, 0] == 0`` (CLS) and the remaining kept
    indices are sorted ascending (gather-friendly; permutation-invariant to
    the model because positional information is added before the gather).
    """
    L = sequence_length
    noise = jax.random.uniform(rng, (batch_size, L - 1))
    perm = jnp.argsort(noise, axis=-1) + 1  # random permutation of 1..L-1
    idx_mask = perm[:, :num_masked]
    idx_keep_patches = jnp.sort(perm[:, num_masked:], axis=-1)
    cls = jnp.zeros((batch_size, 1), dtype=perm.dtype)
    idx_keep = jnp.concatenate([cls, idx_keep_patches], axis=-1)
    return idx_keep, idx_mask


def get_at_index(tokens: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Batched gather along the token axis: (B, L, D)[(B, K)] → (B, K, D)."""
    return jnp.take_along_axis(tokens, index[:, :, None], axis=1)


@jax.custom_vjp
def get_at_index_mm(tokens: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """``get_at_index`` with a one-hot-MATMUL backward.

    The VJP of a token gather is a scatter-add into the (B, L, D) token
    tensor; XLA lowers that scatter on TPU much more slowly than an
    equivalent one-hot contraction on the MXU, so the backward here is
    dL/dtokens[b,l,d] = Σ_k 1[index[b,k]=l]·g[b,k,d] as a batched matmul.
    Forward is the plain gather (identical numerics and speed).
    """
    return get_at_index(tokens, index)


def _gai_mm_fwd(tokens, index):
    return get_at_index(tokens, index), (index, tokens.shape[1])


def _gai_mm_bwd(res, g):
    index, L = res
    onehot = (index[:, :, None] == jnp.arange(L)[None, None, :]).astype(g.dtype)
    dtokens = jax.lax.dot_general(
        onehot, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)  # (B, L, D)
    return dtokens, np.zeros(index.shape, dtype=jax.dtypes.float0)


get_at_index_mm.defvjp(_gai_mm_fwd, _gai_mm_bwd)


def set_at_index(
    tokens: jnp.ndarray, index: jnp.ndarray, value: jnp.ndarray
) -> jnp.ndarray:
    """Batched scatter along the token axis: write (B, K, D) at (B, K)."""
    B, L, D = tokens.shape
    b = jnp.arange(B)[:, None]
    return tokens.at[b, index].set(value)


def repeat_token(token: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Broadcast a (1, 1, D) token to (B, L, D)."""
    B, L = size
    return jnp.broadcast_to(token, (B, L, token.shape[-1]))
