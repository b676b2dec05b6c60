"""Analytic FLOPs and MFU accounting for the bench (VERDICT r3 #6).

Counts the *useful* dense-matmul FLOPs of one training step from the task's
static shapes — the standard MFU numerator (PaLM appendix-B convention:
unpadded model FLOPs, backward = 2x forward). Deliberately excluded:
LayerNorm/softmax/elementwise (negligible), the on-device uint8 augmentation
resample, and the one-hot gather/scatter matmuls (real MXU work on this
design, ~1-3%% of step FLOPs — excluding them makes the reported MFU
slightly conservative). Kernel lane padding (L 145->256 in the score tiles)
is likewise NOT counted: MFU measures useful work, so padding waste shows up
as lower MFU, which is the point.

Peak bf16 FLOP/s comes from the device kind; override with
``SSRL_PEAK_TFLOPS`` when the kind is unrecognized.
"""

from __future__ import annotations

import os
from typing import Optional

# bf16 dense peak per chip, FLOP/s (public TPU spec sheets).
_PEAK_BY_KIND = (
    ("v5 lite", 197e12),
    ("v5litepod", 197e12),
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6 lite", 918e12),
    ("v6e", 918e12),
    ("trillium", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def peak_flops_per_chip(device_kind: str) -> Optional[float]:
    env = os.environ.get("SSRL_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = device_kind.lower()
    for key, peak in _PEAK_BY_KIND:
        if key in kind:
            return peak
    return None


def block_flops(L: int, D: int, mlp_ratio: float = 4.0) -> int:
    """Matmul FLOPs of one pre-LN transformer block forward on L tokens."""
    hidden = int(D * mlp_ratio)
    attn = 2 * L * D * (3 * D) + 2 * L * L * D + 2 * L * L * D + 2 * L * D * D
    mlp = 2 * L * D * hidden + 2 * L * hidden * D
    return attn + mlp


def _stack(L: int, D: int, depth: int, mlp_ratio: float = 4.0) -> int:
    return depth * block_flops(L, D, mlp_ratio)


def task_flops_per_image(task, ctx=None) -> int:
    """Training-step FLOPs per image for a task (fwd + 2x-fwd backward).

    ``ctx`` is the task's ``epoch_context`` value (the MAE static mask
    count); defaults to epoch-0 context.
    """
    name = type(task).__name__
    if ctx is None:
        ctx = task.epoch_context(0)
    if name == "MAETask":
        m = task.model
        N = (m.image_size // m.patch_size) ** 2
        L = N + 1
        n_mask = int(ctx)
        L_keep = L - n_mask
        P2C = m.patch_size * m.patch_size * m.in_chans
        fwd = (
            2 * N * P2C * m.embed_dim  # patch embed (pre-gather, all patches)
            + _stack(L_keep, m.embed_dim, m.depth)
            + 2 * L_keep * m.embed_dim * m.decoder_embed_dim  # decoder embed
            + _stack(L, m.decoder_embed_dim, m.decoder_depth)
            + 2 * n_mask * m.decoder_embed_dim * P2C  # pixel head (masked rows)
        )
        return 3 * fwd
    if name == "JEPATask":
        m = task.model
        N = m.num_patches
        L = N + 1
        L_ctx = task.context_size + 1
        M = task.num_blocks * task.block_area
        P2C = m.patch_size * m.patch_size * m.in_chans
        Dp = m.predictor_embed_dim
        ctx_fwd = (
            2 * N * P2C * m.embed_dim
            + _stack(L_ctx, m.embed_dim, m.depth)
            + 2 * L_ctx * m.embed_dim * Dp  # predictor embed
            + _stack(L, Dp, m.predictor_depth)
            + 2 * M * Dp * m.embed_dim  # latent projection head
        )
        target_fwd = 2 * N * P2C * m.embed_dim + _stack(L, m.embed_dim, m.depth)
        return 3 * ctx_fwd + target_fwd  # EMA tower is forward-only
    if name == "ClassifierTask":
        m = task.model
        enc = m.encoder if hasattr(m, "encoder") else m
        img = getattr(m, "img_size", getattr(m, "image_size", 96))
        patch = getattr(m, "patch_size", 8)
        in_chans = getattr(m, "in_chans", 3)
        D = getattr(m, "embed_dim", 144)
        depth = getattr(m, "depth", 4)
        N = (img // patch) ** 2
        L = N + 1
        P2C = patch * patch * in_chans
        enc_fwd = 2 * N * P2C * D + _stack(L, D, depth)
        head_fwd = 2 * D * 10
        if getattr(task, "_freeze_encoder", False) and not getattr(
            task, "_unfreeze_last", None
        ):
            return enc_fwd + 3 * head_fwd  # frozen backbone: forward only
        return 3 * (enc_fwd + head_fwd)
    raise ValueError(f"unknown task type {name}")


def device_step_ms_from_trace(profile_dir: str, n_steps: int) -> Optional[float]:
    """Device-sum step time from a jax.profiler trace (xplane).

    Sums the durations of 'XLA Modules'-line events on TPU device planes and
    divides by the timed step count. Returns None when the trace has no
    device plane (CPU runs, or the axon relay not exporting device traces).
    """
    import glob

    files = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not files:
        return None
    try:
        from jax.profiler import ProfileData
    except ImportError:
        return None
    total_ns = 0
    found = False
    for f in files:
        data = ProfileData.from_file(f)
        for plane in data.planes:
            if "/device:TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    total_ns += ev.duration_ns
                    found = True
    if not found:
        return None
    return total_ns / 1e6 / n_steps
