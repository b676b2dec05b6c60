"""Fused on-device image augmentation (jit/XLA), replacing host transforms.

The reference augments on CPU inside 4 DataLoader worker processes
(RandomResizedCrop(96, scale=(0.8, 1.0)) + RandomHorizontalFlip + ToTensor +
Normalize(0.5, 0.5), reference ``src/data.py:15-34``) and ships float32
tensors over pinned memory. Here the host ships raw **uint8 NHWC** batches and
the whole augmentation runs on device inside the jitted train step:

  uint8 → bilinear random-resized-crop (scale/translate gather) → flip
        → normalize to [-1, 1] (x * 2/255 - 1)

which is HBM-bandwidth-friendly (4× smaller H2D transfer) and fuses into the
surrounding XLA program.

RandomResizedCrop semantics follow torchvision: target area uniform in
``scale``·H·W, aspect ratio log-uniform in (3/4, 4/3); instead of
torchvision's 10-attempt rejection loop (data-dependent control flow that
doesn't jit), the sampled crop box is clamped to the image — a negligible
distribution difference at scale (0.8, 1.0) on square images, documented here
deliberately (SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_RATIO = (3.0 / 4.0, 4.0 / 3.0)


def normalize(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0, 255] → dtype in [-1, 1] (Normalize(mean=.5, std=.5))."""
    return images_u8.astype(dtype) * jnp.asarray(2.0 / 255.0, dtype) - jnp.asarray(
        1.0, dtype
    )


def _axis_weights(start, size, out_n: int, limit: int, flip=None) -> jnp.ndarray:
    """(B, out_n, limit) bilinear resampling matrix for one spatial axis.

    Row o holds the triangle weights max(0, 1-|src(o) - s|) of output sample
    o against source positions s, with the source coordinate clamped to the
    image (edge-pixel replication, matching torch's coordinate clamping).

    ``flip`` (B,) bool: reverse the OUTPUT rows per example — horizontal
    flip folded into the matrix. The select runs on the (B, out) source
    COORDINATES, not the (B, out, limit) weights: row permutation commutes
    bit-exactly with the elementwise triangle map, and the round-5 profile
    showed the weight-level reverse materializing as a 0.12 ms/step
    ``reverse`` op on the (B, 96, 96) tensor (docs/PERFORMANCE.md).
    """
    src = start[:, None] + (jnp.arange(out_n)[None, :] + 0.5) * (
        size[:, None] / out_n
    ) - 0.5
    src = jnp.clip(src, 0.0, float(limit - 1))  # (B, out)
    if flip is not None:
        src = jnp.where(flip[:, None], src[:, ::-1], src)
    s = jnp.arange(limit, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - s[None, None, :]))


def _crop_resize_cols(
    images: jnp.ndarray, tops, lefts, hs, ws, out_hw: Tuple[int, int],
    flip_x=None,
) -> jnp.ndarray:
    """Bilinear resample of per-image crop boxes → (B, out_h, C, out_w).

    Two batched MXU contractions against dense per-image bilinear weight
    matrices (each row has ≤2 nonzeros). Measured at B=384 on v5e:
    0.35 ms/step vs 1.4 ms for ``jax.image.scale_and_translate`` (which
    builds equivalent matrices through vmapped ops) and 2.9 ms for a
    gather-and-lerp formulation (docs/PERFORMANCE.md). No antialiasing —
    torchvision tensor-backend bilinear semantics; at crop scale (0.8, 1.0)
    the downscale factor is ≤1.12 so the antialias filter support is ~1
    pixel and the difference is negligible.

    Returns the second contraction's NATURAL output layout (B, out_h, C,
    out_w) — the NHWC transpose is the caller's choice, because the
    patch-token consumer (``apply_augment_patches``) can reorder straight
    from here and skip it.
    """
    B, H, W, C = images.shape
    out_h, out_w = out_hw
    wy = _axis_weights(tops, hs, out_h, H)  # (B, out_h, H)
    # horizontal flip ≡ output-row reversal, folded into the coordinates
    wx = _axis_weights(lefts, ws, out_w, W, flip=flip_x)  # (B, out_w, W)
    # rows: contract H → (B, out_h, W, C)
    rows = jax.lax.dot_general(
        wy, images.reshape(B, H, W * C), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(B, out_h, W, C)
    # cols: contract W → (B, out_h, C, out_w)
    return jax.lax.dot_general(
        rows, wx, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _crop_resize_batch(
    images: jnp.ndarray, tops, lefts, hs, ws, out_hw: Tuple[int, int],
    flip_x=None,
) -> jnp.ndarray:
    """Bilinear resample of per-image crop boxes → (B, out_h, out_w, C)."""
    cols = _crop_resize_cols(images, tops, lefts, hs, ws, out_hw, flip_x)
    return jnp.transpose(cols, (0, 1, 3, 2))


def draw_augment_params(rng: jax.Array, batch: int):
    """Per-example augmentation randomness, separated from the apply step.

    Returns ``(u, flip)``: ``u`` (B, 4) crop uniforms, ``flip`` (B,) bools.
    Row-independent by construction, so a data-parallel shard can draw at
    the GLOBAL batch size and slice its rows — every chip then applies
    exactly the augmentation a single-chip run would (the trainer's
    shard_map path relies on this; ``Task._draw_sliced``).
    """
    k_crop, k_flip = jax.random.split(rng)
    u = jax.random.uniform(k_crop, (batch, 4))
    flip = jax.random.bernoulli(k_flip, 0.5, (batch, 1, 1, 1)).reshape(batch)
    return u, flip


def _crop_box_from_u(u, height, width, scale, ratio):
    """(B, 4) uniforms → (top, left, crop_h, crop_w) crop boxes.

    Torchvision RandomResizedCrop semantics: target area uniform in
    scale·H·W, aspect log-uniform, box clamped to the image (the one
    batched (B, 4) draw replaces B key-splits — ~1.1 ms/step of threefry
    hashing at B=384 on v5e, profiled; docs/PERFORMANCE.md).
    """
    area = height * width
    target_area = area * (scale[0] + u[:, 0] * (scale[1] - scale[0]))
    log_lo, log_hi = math.log(ratio[0]), math.log(ratio[1])
    aspect = jnp.exp(log_lo + u[:, 1] * (log_hi - log_lo))
    w = jnp.sqrt(target_area * aspect)
    h = jnp.sqrt(target_area / aspect)
    w = jnp.clip(w, 1.0, float(width))
    h = jnp.clip(h, 1.0, float(height))
    top = u[:, 2] * (height - h)
    left = u[:, 3] * (width - w)
    return top, left, h, w


@partial(jax.jit, static_argnames=("out_size", "scale", "ratio", "dtype"))
def apply_augment(
    u: jnp.ndarray,
    flip: jnp.ndarray,
    images_u8: jnp.ndarray,
    out_size: int = 96,
    scale: Tuple[float, float] = (0.8, 1.0),
    ratio: Tuple[float, float] = DEFAULT_RATIO,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Apply pre-drawn augmentation params (``draw_augment_params``)."""
    B, H, W, C = images_u8.shape
    images = normalize(images_u8, dtype=jnp.float32)
    tops, lefts, hs, ws = _crop_box_from_u(u, H, W, scale, ratio)
    # flip folded into the resample: reversing the horizontal weight-matrix
    # rows ≡ reversing the output columns, term-for-term (same two nonzeros
    # per row, same order) — the select runs on the (B, out, W) weights
    # instead of the 8× larger output images, and the full-image reverse op
    # disappears from the step (~0.9 ms at B=768, docs/PERFORMANCE.md)
    out = _crop_resize_batch(
        images, tops, lefts, hs, ws, (out_size, out_size), flip_x=flip
    )
    return out.astype(dtype)


@partial(
    jax.jit, static_argnames=("patch_size", "out_size", "scale", "ratio", "dtype")
)
def apply_augment_patches(
    u: jnp.ndarray,
    flip: jnp.ndarray,
    images_u8: jnp.ndarray,
    patch_size: int = 8,
    out_size: int = 96,
    scale: Tuple[float, float] = (0.8, 1.0),
    ratio: Tuple[float, float] = DEFAULT_RATIO,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """``apply_augment`` fused with ``patchify``: uint8 → (B, N, p*p*C).

    Value-identical to ``patchify(apply_augment(...), patch_size)`` (the
    parity test asserts exact equality) but reorders pixels ONCE, straight
    from the resample's natural (B, out_h, C, out_w) output — the NHWC
    intermediate and its relayout copies never exist. The default train
    path since round 5; the models accept the (B, N, P) tokens directly
    (``VisionTransformer.__call__`` ndim==3 branch). Replaces the
    reference's host-side transform + in-model PatchEmbed prologue
    (reference ``src/data.py:15-34`` + ``src/models/mae.py:85``).
    """
    B, H, W, C = images_u8.shape
    images = normalize(images_u8, dtype=jnp.float32)
    tops, lefts, hs, ws = _crop_box_from_u(u, H, W, scale, ratio)
    cols = _crop_resize_cols(
        images, tops, lefts, hs, ws, (out_size, out_size), flip_x=flip
    )  # (B, out_h, C, out_w)
    from ssrl_vit_mae_jepa_tpu.ops.patches import patchify_hcw

    return patchify_hcw(cols, patch_size).astype(dtype)


@partial(jax.jit, static_argnames=("out_size", "scale", "ratio", "dtype"))
def random_resized_crop_flip_normalize(
    rng: jax.Array,
    images_u8: jnp.ndarray,
    out_size: int = 96,
    scale: Tuple[float, float] = (0.8, 1.0),
    ratio: Tuple[float, float] = DEFAULT_RATIO,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Train-time augmentation: (B, H, W, C) uint8 → (B, out, out, C) in [-1, 1]."""
    u, flip = draw_augment_params(rng, images_u8.shape[0])
    return apply_augment(
        u, flip, images_u8, out_size=out_size, scale=scale, ratio=ratio,
        dtype=dtype,
    )


@partial(jax.jit, static_argnames=("out_size", "dtype"))
def eval_transform(
    images_u8: jnp.ndarray, out_size: int = 96, dtype=jnp.float32
) -> jnp.ndarray:
    """Eval transform: Resize(out)+CenterCrop(out)+normalize.

    For STL-10's native 96×96 inputs with out_size 96 the geometric part is
    the identity (as in the reference), so this is just the normalize.
    """
    B, H, W, C = images_u8.shape
    x = normalize(images_u8, dtype=jnp.float32)
    if (H, W) != (out_size, out_size):
        short = min(H, W)
        new_h, new_w = (
            (out_size, int(round(out_size * W / short)))
            if H <= W
            else (int(round(out_size * H / short)), out_size)
        )
        x = jax.image.resize(x, (B, new_h, new_w, C), method="linear")
        top = (new_h - out_size) // 2
        left = (new_w - out_size) // 2
        x = jax.lax.dynamic_slice(
            x, (0, top, left, 0), (B, out_size, out_size, C)
        )
    return x.astype(dtype)
