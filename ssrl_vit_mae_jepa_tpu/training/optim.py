"""Optimizer assembly + freeze policy as optimizer masking.

Reference semantics: AdamW (torch defaults: betas (0.9, 0.999), eps 1e-8,
decoupled weight decay) over ``requires_grad`` params only
(``src/training/classifier.py:107-111``), gradient clip by global norm 1.0
(``pretrain_mae.py:124-125``), LR stepped per epoch.

The idiomatic JAX equivalent of ``requires_grad`` is a boolean mask pytree:
- ``optax.masked`` freezes updates (and Adam state) for frozen leaves,
- ``jax.lax.stop_gradient`` is applied to frozen leaves inside the loss so
  XLA dead-code-eliminates their backward pass entirely,
- global-norm clipping therefore sees only trainable grads — matching the
  reference, where frozen params never produce grads.

Freeze policies (reference ``src/training/classifier.py:128-171``):
- ``freeze_encoder``: everything without "head" in its path is frozen,
- ``unfreeze_last_layers(n)``: freeze all, then unfreeze the last n encoder
  blocks + the final encoder norm + the head.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax


def make_optimizer(
    learning_rate: float,
    weight_decay: float,
    grad_clip: Optional[float] = 1.0,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW chain with injectable learning rate (set per-epoch inside jit)."""

    def factory(learning_rate):
        parts = []
        if grad_clip is not None:
            parts.append(optax.clip_by_global_norm(grad_clip))
        parts.append(
            optax.adamw(
                learning_rate,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=weight_decay,
            )
        )
        tx = optax.chain(*parts)
        if trainable_mask is not None:
            tx = optax.masked(tx, trainable_mask)
        return tx

    return optax.inject_hyperparams(factory)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr):
    """Override the injected LR inside a jitted step (traced value OK)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def _param_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat]


def trainable_mask(
    params,
    freeze_encoder: bool = False,
    unfreeze_last_layers: Optional[int] = None,
    depth: Optional[int] = None,
):
    """Boolean pytree: True = trainable. Mirrors the reference freeze policy
    precedence (``scripts/training/train_mae.py:166-176``):
    unfreeze_last_layers > freeze_encoder > all-trainable."""

    def decide(path_str: str) -> bool:
        if unfreeze_last_layers is not None:
            if depth is None:
                raise ValueError("depth required for unfreeze_last_layers")
            n = int(unfreeze_last_layers)
            if n < 0 or n > depth:
                raise ValueError(
                    f"n_layers must be between 0 and {depth}, got {n}"
                )
            if "head" in path_str:
                return True
            for i in range(depth - n, depth):
                if f"blocks_{i}/" in path_str:
                    return True
            # final encoder LayerNorm ("encoder/norm/..."), not block norms
            if path_str.startswith("encoder/norm/"):
                return True
            return False
        if freeze_encoder:
            return "head" in path_str
        return True

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    mask_leaves = [
        decide("/".join(str(getattr(p, "key", p)) for p in path))
        for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, mask_leaves)


def stop_gradients_on_frozen(params, mask):
    """stop_gradient on frozen leaves so XLA skips their backward entirely."""
    return jax.tree.map(
        lambda p, t: p if t else jax.lax.stop_gradient(p), params, mask
    )


def count_trainable(params, mask) -> int:
    leaves = jax.tree.leaves(
        jax.tree.map(lambda p, t: p.size if t else 0, params, mask)
    )
    return int(sum(leaves))
