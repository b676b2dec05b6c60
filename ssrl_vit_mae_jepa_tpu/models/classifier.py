"""ViT classifier: encoder tokens → pool → linear head.

Contract from reference ``src/models/classifier.py:10-57``:
- ``ClassificationHead`` is a single Linear,
- pooling is either the CLS token (``pool="cls"``) or the mean over **all**
  tokens *including* CLS (``pool="mean"``) — the reference's documented
  inconsistency with its viz script is SURVEY.md quirk Q6 and is preserved.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.models.vit import VisionTransformer, trunc_normal_init


class ClassificationHead(nn.Module):
    num_classes: int = 10
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="classification",
        )(x)


class ViTClassifier(nn.Module):
    """Classifier on top of a (pretrained) ViT encoder."""

    img_size: int = 96
    patch_size: int = 8
    in_chans: int = 3
    embed_dim: int = 144
    depth: int = 4
    num_heads: int = 6
    num_classes: int = 10
    pool: str = "cls"
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    def setup(self):
        self.encoder = VisionTransformer(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )
        self.head = ClassificationHead(
            num_classes=self.num_classes, dtype=self.dtype, name="head"
        )

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → pooled (B, D) features (pre-head)."""
        feats = self.encoder(images)  # (B, L, D)
        if self.pool == "cls":
            return feats[:, 0]
        if self.pool == "mean":
            # mean over all tokens INCLUDING CLS (reference
            # src/models/classifier.py:55)
            return feats.mean(axis=1)
        raise ValueError(f"unknown pool {self.pool!r} (expected cls|mean)")

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → (B, num_classes) logits (fp32)."""
        return self.head(self.features(images)).astype(jnp.float32)


def classifier_from_config(
    model_cfg: dict,
    num_classes: int = 10,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
):
    """Build a ViTClassifier from the reference YAML ``model`` section."""
    general = model_cfg.get("general", {})
    enc = model_cfg.get("encoder", {})
    head = model_cfg.get("head", {}) or {}
    return ViTClassifier(
        img_size=general.get("image_size", 96),
        patch_size=general.get("patch_size", 8),
        in_chans=general.get("in_chans", 3),
        embed_dim=enc.get("embed_dim", 144),
        depth=enc.get("depth", 4),
        num_heads=enc.get("num_heads", 6),
        num_classes=num_classes,
        pool=head.get("pool", "cls"),
        dtype=dtype,
        attn_impl=attn_impl,
    )
