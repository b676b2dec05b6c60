"""I-JEPA multi-block masking, static-shaped for XLA.

I-JEPA (Assran et al., 2023) samples M rectangular *target* blocks per image
and a *context* region excluding them. Data-dependent block sizes would be
dynamic shapes under jit, so this TPU adaptation fixes the block AREA and
samples the block SHAPE from a static set of (h, w) factorizations matching
the configured aspect-ratio range, plus a uniform-random top-left corner:

- every target block covers exactly ``block_area`` patches (counts static),
- blocks may overlap (as in I-JEPA),
- the context is a fixed count of ``context_size`` patches, drawn by one of
  two samplers (I-JEPA's contiguous context block minus targets yields
  variable counts, so both are fixed-count static-shape adaptations):
  * ``complement`` — uniform sample of the complement of the target union;
  * ``block`` — I-JEPA-faithful: a square context block with scale sampled
    from ``context_scale`` (paper: 0.85–1.0, unit aspect), minus the target
    union; drawn as a priority sample that prefers in-block non-target
    patches and falls back to out-of-block non-target patches only when the
    block minus targets is smaller than ``context_size``.

All indices returned are PATCH-space [0, N); callers add the CLS offset.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def block_shapes_for(
    area: int, aspect_range: Tuple[float, float] = (0.75, 1.5)
) -> List[Tuple[int, int]]:
    """Static (h, w) factorizations of ~area with aspect h/w in range."""
    shapes = []
    for h in range(1, area + 1):
        w = max(1, round(area / h))
        if h * w != area:
            continue
        aspect = h / w
        if aspect_range[0] <= aspect <= aspect_range[1]:
            shapes.append((h, w))
    if not shapes:  # fall back to the squarest factor pair
        best = min(
            (
                (abs(h - area // h), (h, area // h))
                for h in range(1, area + 1)
                if area % h == 0
            ),
        )[1]
        shapes = [best]
    return shapes


def sample_jepa_masks(
    rng: jax.Array,
    batch_size: int,
    grid_size: int,
    num_blocks: int,
    block_area: int,
    context_size: int,
    aspect_range: Tuple[float, float] = (0.75, 1.5),
    context_sampling: str = "complement",
    context_scale: Tuple[float, float] = (0.85, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (target_idx (B, num_blocks·block_area), ctx_idx (B, context_size)),
    patch-space indices."""
    N = grid_size * grid_size
    shapes = block_shapes_for(block_area, aspect_range)
    # static per-shape offset tables (S, area, 2)
    offs = np.zeros((len(shapes), block_area, 2), np.int32)
    max_top = np.zeros((len(shapes), 2), np.int32)
    for s, (h, w) in enumerate(shapes):
        dy, dx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        offs[s, :, 0] = dy.ravel()
        offs[s, :, 1] = dx.ravel()
        max_top[s] = (grid_size - h, grid_size - w)
    offs = jnp.asarray(offs)
    max_top = jnp.asarray(max_top)

    k_shape, k_pos, k_ctx = jax.random.split(rng, 3)
    shape_id = jax.random.randint(
        k_shape, (batch_size, num_blocks), 0, len(shapes)
    )
    u = jax.random.uniform(k_pos, (batch_size, num_blocks, 2))
    lim = max_top[shape_id]  # (B, M, 2)
    top_left = jnp.floor(u * (lim + 1)).astype(jnp.int32)
    block_offs = offs[shape_id]  # (B, M, area, 2)
    yx = top_left[:, :, None, :] + block_offs
    target_idx = (yx[..., 0] * grid_size + yx[..., 1]).reshape(batch_size, -1)

    # context: fixed-count priority sample. Lowest priority wins a slot;
    # targets carry a large penalty so they are picked only if fewer than
    # context_size non-target patches exist (impossible by construction of
    # context_size in the task).
    is_target = (
        jnp.zeros((batch_size, N), jnp.float32)
        .at[jnp.arange(batch_size)[:, None], target_idx]
        .set(1.0)
    )
    # three independent keys: k_prio is consumed by the priority draw, so
    # the block scale/corner must come from separate splits (re-splitting a
    # consumed key correlates the context-box placement with the tiebreak
    # priorities inside it)
    k_prio, k_scale, k_corner = jax.random.split(k_ctx, 3)
    priority = jax.random.uniform(k_prio, (batch_size, N)) + is_target * 20.0
    if context_sampling == "block":
        # contiguous square context block (I-JEPA: scale 0.85-1.0, aspect 1):
        # membership is a static-shape coordinate test, so the rectangle size
        # can vary freely per sample. Out-of-block patches get a medium
        # penalty — used only when |block \ targets| < context_size.
        s = jax.random.uniform(
            k_scale, (batch_size, 1), minval=context_scale[0],
            maxval=context_scale[1],
        )
        side = jnp.clip(
            jnp.floor(grid_size * jnp.sqrt(s)).astype(jnp.int32), 1, grid_size
        )  # (B, 1)
        u2 = jax.random.uniform(k_corner, (batch_size, 2))
        corner = jnp.floor(u2 * (grid_size - side + 1)).astype(jnp.int32)
        rows = jnp.arange(N, dtype=jnp.int32) // grid_size  # (N,)
        cols = jnp.arange(N, dtype=jnp.int32) % grid_size
        in_block = (
            (rows[None, :] >= corner[:, :1])
            & (rows[None, :] < corner[:, :1] + side)
            & (cols[None, :] >= corner[:, 1:])
            & (cols[None, :] < corner[:, 1:] + side)
        )
        priority = priority + jnp.where(in_block, 0.0, 5.0)
    elif context_sampling != "complement":
        raise ValueError(f"unknown context_sampling: {context_sampling}")
    ctx_idx = jnp.argsort(priority, axis=-1)[:, :context_size]
    return target_idx, ctx_idx
