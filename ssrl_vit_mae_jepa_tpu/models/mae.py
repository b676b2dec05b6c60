"""Masked Autoencoder (MAE) with ViT backbone — TPU-native.

Mirrors the behavioral contract of the reference ``MaskedAutoencoder``
(``src/models/mae.py:12-94``), which composes timm's ViT with lightly's
``MaskedVisionTransformerTIMM`` / ``MAEDecoderTIMM``:

- encoder runs only on kept tokens (CLS + ~25% of patches at mask 0.75),
- decoder: linear embed to decoder dim, broadcast learned mask token over the
  full 145-token sequence, scatter encoded tokens at ``idx_keep``, add
  decoder pos-embed, run decoder blocks, gather ``idx_mask`` positions,
  pixel-prediction head (reference ``src/models/mae.py:57-75``),
- pixel targets: patchified images gathered at ``clamp(idx_mask - 1, 0)``
  (the CLS-offset shift, reference ``src/models/mae.py:90-92``; safe because
  index 0 is never masked — SURVEY.md quirk Q7).

Mask generation lives *outside* the module (``ops.masking.random_token_mask``)
so the jitted train step controls the RNG and the masked count stays static.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.models.vit import (
    VisionTransformer,
    _BlockParams,
    trunc_normal_init,
)
from ssrl_vit_mae_jepa_tpu.ops.masking import (
    get_at_index_mm,
    repeat_token,
    set_at_index_mm,
)
from ssrl_vit_mae_jepa_tpu.ops.patches import patchify


class MAEDecoder(nn.Module):
    """Lightly ``MAEDecoderTIMM`` contract (SURVEY.md §2.2)."""

    num_patches: int
    patch_size: int
    embed_dim: int
    decoder_embed_dim: int
    decoder_depth: int
    decoder_num_heads: int
    in_chans: int = 3
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    def setup(self):
        dd = self.decoder_embed_dim
        self.decoder_embed = nn.Dense(
            dd, dtype=self.dtype, kernel_init=trunc_normal_init, name="decoder_embed"
        )
        self.mask_token = self.param(
            "mask_token", trunc_normal_init, (1, 1, dd), jnp.float32
        )
        self.decoder_pos_embed = self.param(
            "decoder_pos_embed",
            trunc_normal_init,
            (1, self.num_patches + 1, dd),
            jnp.float32,
        )
        # single param declaration for both block routes (weight-resident
        # chain kernel on TPU / per-block Block with injected params) —
        # see models.vit.run_block_stack; tree unchanged: decoder_blocks_{i}
        self.decoder_blocks = [
            _BlockParams(
                dd,
                int(dd * self.mlp_ratio),
                name=f"decoder_blocks_{i}",
            )
            for i in range(self.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="decoder_norm"
        )
        self.decoder_pred = nn.Dense(
            self.patch_size**2 * self.in_chans,
            dtype=self.dtype,
            kernel_init=trunc_normal_init,
            name="decoder_pred",
        )

    def embed(self, x):
        return self.decoder_embed(x.astype(self.dtype))

    def decode_tokens(self, x):
        """Pos-embed + decoder blocks, WITHOUT the final norm.

        ``decoder_norm`` is per-token, so callers that consume only a
        subset of positions (MAE: the masked tokens; JEPA: the targets)
        gather FIRST and norm the gathered rows — identical numerics,
        25–70% less LN work (docs/PERFORMANCE.md round-3 levers).
        """
        from ssrl_vit_mae_jepa_tpu.models.vit import run_block_stack

        x = x + self.decoder_pos_embed.astype(self.dtype)
        return run_block_stack(
            x, self.decoder_blocks, self.decoder_embed_dim,
            self.decoder_num_heads, self.mlp_ratio, self.dtype, self.attn_impl,
        )

    def decode(self, x):
        return self.decoder_norm(self.decode_tokens(x))

    def predict(self, x):
        return self.decoder_pred(x)

    def __call__(self, x):  # for init: trace every submodule
        return self.predict(self.decode(self.embed(x)))

    def mask_token_value(self):
        return self.mask_token


class MaskedAutoencoder(nn.Module):
    """MAE = masked ViT encoder + mask-token decoder (pred, target) pairs."""

    image_size: int = 96
    patch_size: int = 8
    in_chans: int = 3
    embed_dim: int = 144
    depth: int = 4
    num_heads: int = 6
    decoder_embed_dim: int = 192
    decoder_depth: int = 2
    decoder_num_heads: int = 6
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def sequence_length(self) -> int:
        return self.num_patches + 1

    def setup(self):
        self.encoder = VisionTransformer(
            img_size=self.image_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )
        self.decoder = MAEDecoder(
            num_patches=self.num_patches,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            decoder_embed_dim=self.decoder_embed_dim,
            decoder_depth=self.decoder_depth,
            decoder_num_heads=self.decoder_num_heads,
            in_chans=self.in_chans,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="decoder",
        )

    def forward_encoder(self, images, idx_keep=None):
        return self.encoder(images, idx_keep=idx_keep)

    def forward_decoder(self, x_encoded, idx_keep, idx_mask):
        B = x_encoded.shape[0]
        x_decode = self.decoder.embed(x_encoded)
        x_masked = repeat_token(
            self.decoder.mask_token_value().astype(self.dtype),
            (B, self.sequence_length),
        )
        x_masked = set_at_index_mm(
            x_masked, idx_keep, x_decode.astype(x_masked.dtype)
        )
        x_decoded = self.decoder.decode_tokens(x_masked)
        # gather-then-norm ≡ norm-then-gather (LN is per-token): norm only
        # the 108 masked rows instead of all 145
        x_pred = get_at_index_mm(x_decoded, idx_mask)
        x_pred = self.decoder.decoder_norm(x_pred)
        return self.decoder.predict(x_pred)

    def forward_dense(
        self, images: jnp.ndarray, idx_keep: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dense-loss forward: predict EVERY token; no masked-index gathers.

        Returns ``(pred, target)`` with pred (B, L=num_patches+1, P) — row
        0 is the CLS position, sliced off by the caller so it fuses into
        the elementwise loss — and target (B, num_patches, P). The MAE
        task weights the squared error by a (B, num_patches) mask instead
        of gathering the masked rows: the loss AND gradients are
        identical (unmasked rows receive zero cotangent, so decoder_norm
        / decoder_pred see the same param grads), but the two one-hot
        gather matmuls, the backward scatter-transpose, and their f32
        relayout copies disappear from the step (round-5 lever,
        docs/PERFORMANCE.md). Cost: decoder_norm + decoder_pred run on
        all L rows instead of the M masked ones — ~+34% of a 192×192
        GEMM at the flagship geometry, trivial next to the removed
        gathers. Reference loss contract it preserves:
        /root/reference/src/models/mae.py:96-116 (MSE on masked patches).
        """
        x_encoded = self.forward_encoder(images, idx_keep=idx_keep)
        B = x_encoded.shape[0]
        x_decode = self.decoder.embed(x_encoded)
        x_masked = repeat_token(
            self.decoder.mask_token_value().astype(self.dtype),
            (B, self.sequence_length),
        )
        x_masked = set_at_index_mm(
            x_masked, idx_keep, x_decode.astype(x_masked.dtype)
        )
        x_decoded = self.decoder.decode_tokens(x_masked)
        x_pred = self.decoder.predict(self.decoder.decoder_norm(x_decoded))
        target = (
            images if images.ndim == 3 else patchify(images, self.patch_size)
        )
        return x_pred, target

    def __call__(
        self, images: jnp.ndarray, idx_keep: jnp.ndarray, idx_mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images (B,H,W,C in [-1,1]) — or pre-patchified (B,N,p*p*C)
        tokens — with idx_keep (B,K), idx_mask (B,M) →
        (pred, target), both (B, M, p*p*C)."""
        x_encoded = self.forward_encoder(images, idx_keep=idx_keep)
        x_pred = self.forward_decoder(x_encoded, idx_keep, idx_mask)
        patches = (
            images if images.ndim == 3 else patchify(images, self.patch_size)
        )
        idx_mask_adj = jnp.clip(idx_mask - 1, 0, None)
        # one-hot matmul, not take_along_axis: exact (fp32 0/1 contraction),
        # and the gather's batch-minor layout preference cost ~1.3 ms/step
        # of relayout copies around the fp32 target path at B=768
        # (docs/PERFORMANCE.md round-3 profile)
        target = get_at_index_mm(patches, idx_mask_adj)
        return x_pred, target


def mae_from_config(model_cfg: dict, dtype=jnp.bfloat16, attn_impl: str = "auto"):
    """Build a MaskedAutoencoder from the reference YAML ``model`` section."""
    general = model_cfg.get("general", {})
    enc = model_cfg.get("encoder", {})
    dec = model_cfg.get("decoder", {})
    return MaskedAutoencoder(
        image_size=general.get("image_size", 96),
        patch_size=general.get("patch_size", 8),
        in_chans=general.get("in_chans", 3),
        embed_dim=enc.get("embed_dim", 144),
        depth=enc.get("depth", 4),
        num_heads=enc.get("num_heads", 6),
        decoder_embed_dim=dec.get("decoder_embed_dim", 192),
        decoder_depth=dec.get("decoder_depth", 2),
        decoder_num_heads=dec.get("decoder_num_heads", 6),
        dtype=dtype,
        attn_impl=attn_impl,
    )
