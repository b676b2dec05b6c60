"""Patchify / unpatchify between images and flattened patch tokens.

Behavioral contract (reference ``lightly.models.utils.patchify`` used at
``src/models/mae.py:90`` and ``scripts/evaluation/visualize_reconstruction.py:174``):
row-major patch order, each patch flattened channel-first, i.e. an image
(C, H, W) becomes (H/p * W/p, p*p*C) with patch (gy, gx) at index
``gy * (W/p) + gx`` and the flattened patch laid out as C×p×p.

We use NHWC images on device (TPU-friendly layout); the flattened patch
layout is kept **CHW within the patch** to stay bit-compatible with the
reference's pixel targets, which matters for checkpoint-fidelity checks of
the decoder ``predict`` head.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) images → (B, N, p*p*C) patch tokens (CHW-within-patch).

    N = (H/p)*(W/p), row-major over the patch grid.
    """
    B, H, W, C = images.shape
    p = patch_size
    gh, gw = H // p, W // p
    x = images.reshape(B, gh, p, gw, p, C)
    # → (B, gh, gw, C, p, p): channel-first inside the patch, like torch.
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, gh * gw, p * p * C)


def patchify_hcw(x_hcw: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, C, W) channel-interposed images → (B, N, p*p*C) patch tokens.

    Same contract as :func:`patchify` (row-major grid, CHW within the
    patch), entered from the (B, H, C, W) layout the augmentation's second
    resample contraction produces naturally (``ops/augment.py``
    ``_crop_resize_cols``). ONE 6-D transpose does all the reordering —
    the NHWC round-trip (cols→NHWC transpose, then patchify's own
    transpose) that XLA materialized as two relayout copies per use
    disappears (round-5 profile, docs/PERFORMANCE.md).
    """
    B, H, C, W = x_hcw.shape
    p = patch_size
    gh, gw = H // p, W // p
    x = x_hcw.reshape(B, gh, p, C, gw, p)
    # (B, gh, p_y, C, gw, p_x) → (B, gh, gw, C, p_y, p_x)
    x = x.transpose(0, 1, 4, 3, 2, 5)
    return x.reshape(B, gh * gw, p * p * C)


def unpatchify(patches: jnp.ndarray, patch_size: int, channels: int = 3) -> jnp.ndarray:
    """(B, N, p*p*C) patch tokens → (B, H, W, C) images (inverse of patchify)."""
    B, N, D = patches.shape
    p = patch_size
    C = channels
    gh = gw = int(round(N**0.5))
    x = patches.reshape(B, gh, gw, C, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, gh, p, gw, p, C)
    return x.reshape(B, gh * p, gw * p, C)
