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


def _onehot(index: jnp.ndarray, L: int, dtype) -> jnp.ndarray:
    """(B, K) int indices → (B, K, L) one-hot selector."""
    return (index[:, :, None] == jnp.arange(L)[None, None, :]).astype(dtype)


@jax.custom_vjp
def get_at_index_mm(tokens: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """``get_at_index`` as one-hot MATMULS in both directions.

    Exact for any indices (each output row is one token row times a 0/1
    selector, accumulated in fp32). Two reasons this beats gather/scatter on
    TPU (measured at B=384, docs/PERFORMANCE.md):
    - the VJP of a gather is a scatter-add, which XLA lowers ~1.3 ms/step
      slower than this MXU contraction;
    - gathers make XLA prefer batch-minor layouts for everything nearby,
      inserting relayout copies at every Pallas custom-call boundary; the
      one-hot forward keeps the whole chain row-major (−0.5 ms/step).
    The one-hot tensor is rebuilt in the backward instead of saved.
    """
    return _gai_mm_fwd(tokens, index)[0]


def _gai_mm_fwd(tokens, index):
    L = tokens.shape[1]
    out = jax.lax.dot_general(
        _onehot(index, L, tokens.dtype), tokens, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(tokens.dtype)
    return out, (index, L)


def _gai_mm_bwd(res, g):
    index, L = res
    dtokens = jax.lax.dot_general(
        _onehot(index, L, g.dtype), g, (((1,), (1,)), ((0,), (0,))),
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


def set_at_index_mm(
    tokens: jnp.ndarray, index: jnp.ndarray, value: jnp.ndarray
) -> jnp.ndarray:
    """``set_at_index`` for UNIQUE indices, expressed as one-hot matmuls.

    Exact: covered ∈ {0,1} and the contraction writes each value row to its
    single target row. Same layout/VJP rationale as ``get_at_index_mm``
    (autodiff of the dot gives the one-hot gather backward for ``value``
    and the masked pass-through for ``tokens``). −0.6 ms/step at B=384 vs
    the ``.at[].set`` scatter (docs/PERFORMANCE.md).
    """
    B, L, D = tokens.shape
    onehot = _onehot(index, L, value.dtype)
    covered = jnp.sum(onehot, axis=1)  # (B, L) ∈ {0,1} for unique indices
    scattered = jax.lax.dot_general(
        onehot, value, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(tokens.dtype)  # (B, L, D)
    return tokens * (1.0 - covered)[:, :, None].astype(tokens.dtype) + scattered


def repeat_token(token: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Broadcast a (1, 1, D) token to (B, L, D)."""
    B, L = size
    return jnp.broadcast_to(token, (B, L, token.shape[-1]))
