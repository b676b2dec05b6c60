"""LR schedules and the mask-ratio ramp, matching the reference exactly.

Reference semantics (SURVEY.md quirks Q2/Q3):
- schedule factor(epoch) = min((epoch+1)/warmup, 1) * 0.5*(1 + cos(pi*epoch/total))
  — note the cosine applies **during warmup too** (reference
  ``src/training/mae.py:67-72``, ``src/training/classifier.py:113-118``);
- stepped once per **epoch** (Lightning LambdaLR interval="epoch");
- pretrain scales lr by batch/256 (``src/training/mae.py:60``); the
  supervised trainer does not.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_factor(epoch, warmup_epochs: int, total_epochs: int):
    """Reference LambdaLR factor; `epoch` may be a traced scalar."""
    epoch = jnp.asarray(epoch, jnp.float32)
    warmup = (epoch + 1.0) / max(1, warmup_epochs)
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / total_epochs))
    return jnp.minimum(warmup, 1.0) * cosine


def effective_pretrain_lr(base_lr: float, batch_size: int) -> float:
    """Linear LR scaling used only in pretraining (reference src/training/mae.py:60)."""
    return base_lr * batch_size / 256.0


def mask_ratio_at_epoch(
    epoch: int, start: float, end: float, ramp_epochs: int
) -> float:
    """Per-epoch linear mask-ratio ramp (reference ``src/training/mae.py:78-83``).

    Host-side (returns a Python float): the ratio determines the static
    masked-token count, so it must be concrete at trace time.
    """
    progress = min(epoch / max(1, ramp_epochs - 1), 1.0)
    return start + progress * (end - start)


def ema_momentum_at_step(step, total_steps: int, start: float, end: float):
    """JEPA EMA momentum: linear from start to end over all training steps
    (I-JEPA anneals per STEP, not per epoch). `step` may be a traced scalar;
    host callers get a jnp scalar back (float() it)."""
    frac = jnp.minimum(jnp.asarray(step, jnp.float32) / max(1, total_steps), 1.0)
    return start + frac * (end - start)
