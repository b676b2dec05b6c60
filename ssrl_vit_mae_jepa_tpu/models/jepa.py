"""JEPA: joint-embedding predictive architecture with ViT encoders.

New first-class capability (BASELINE.json config 4) — the reference names
JEPA in its title/README but ships no JEPA code (SURVEY.md §0). Design per
I-JEPA (Assran et al., 2023), adapted to the STL-10 tiny-ViT geometry:

- **context encoder**: the same masked-encode ViT as MAE (runs only on the
  CLS + context tokens),
- **target encoder**: identical architecture, parameters are an EMA of the
  context encoder (held in ``TrainState.extra``, never differentiated),
- **predictor**: a narrow transformer operating in a reduced dim: embeds
  context tokens, fills target positions with a learned mask token +
  position embedding, runs blocks over the full token sequence, and projects
  back to encoder dim at the target positions — structurally the MAE decoder
  with a latent (not pixel) output head, so it reuses ``MAEDecoder``.
- **loss**: MSE between predictor outputs and (stop-gradient) target-encoder
  representations at the target positions.

The param tree exposes the context encoder under ``encoder`` — exactly where
``utils.load.encoder_params_from_checkpoint`` looks — so the downstream
probe / fine-tune CLI consumes JEPA checkpoints unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.models.mae import MAEDecoder
from ssrl_vit_mae_jepa_tpu.models.vit import VisionTransformer
from ssrl_vit_mae_jepa_tpu.ops.masking import get_at_index_mm


class JEPA(nn.Module):
    image_size: int = 96
    patch_size: int = 8
    in_chans: int = 3
    embed_dim: int = 144
    depth: int = 4
    num_heads: int = 6
    predictor_embed_dim: int = 96
    predictor_depth: int = 2
    predictor_num_heads: int = 6
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
        # predictor = MAEDecoder with a latent head (pred dim == embed dim)
        self.predictor = MAEDecoder(
            num_patches=self.num_patches,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            decoder_embed_dim=self.predictor_embed_dim,
            decoder_depth=self.predictor_depth,
            decoder_num_heads=self.predictor_num_heads,
            in_chans=self.in_chans,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="predictor",
        )
        # latent projection head (Dp → D), replaces MAEDecoder's pixel head
        self.predictor_proj = nn.Dense(
            self.embed_dim, dtype=self.dtype, name="predictor_proj"
        )

    def encode_context(self, images, idx_keep_tokens):
        """Context encoder over CLS + context tokens."""
        return self.encoder(images, idx_keep=idx_keep_tokens)

    def predict_targets(self, x_ctx, idx_keep_tokens, idx_target_tokens):
        """Predict target latents from encoded context tokens."""
        from ssrl_vit_mae_jepa_tpu.ops.masking import repeat_token, set_at_index_mm

        B = x_ctx.shape[0]
        x = self.predictor.embed(x_ctx)
        seq = repeat_token(
            self.predictor.mask_token_value().astype(self.dtype),
            (B, self.sequence_length),
        )
        # one-hot matmuls for every token scatter/gather: gathers force
        # batch-minor layouts + relayout copies at each Pallas boundary
        # (~2 ms/step at B=768 — docs/PERFORMANCE.md round-3 JEPA profile)
        seq = set_at_index_mm(seq, idx_keep_tokens, x.astype(seq.dtype))
        decoded = self.predictor.decode_tokens(seq)
        # gather-then-norm ≡ norm-then-gather (LN is per-token): norm only
        # the target rows instead of the full 145-token sequence
        pred = get_at_index_mm(decoded, idx_target_tokens)
        pred = self.predictor.decoder_norm(pred)
        return self.predictor_proj(pred)

    def predict_dense(
        self, images: jnp.ndarray, idx_ctx_tokens: jnp.ndarray
    ) -> jnp.ndarray:
        """Dense-loss context forward: predicted latents for EVERY token.

        Companion to ``MaskedAutoencoder.forward_dense`` (round-5 lever):
        the task weights the latent MSE by a (B, L) one-hot occupancy of
        the target indices instead of gathering the target rows — loss
        and grads are identical (zero cotangent at non-target rows), but
        the predictor-side one-hot gather matmul, its backward
        scatter-transpose, and their relayout copies (~2 ms/step at
        B=768 per the round-3 JEPA profile, models/jepa.py:99-101)
        drop out of the step. Cost: decoder_norm + predictor_proj run on
        all L rows instead of the T target rows.
        """
        from ssrl_vit_mae_jepa_tpu.ops.masking import repeat_token, set_at_index_mm

        x_ctx = self.encode_context(images, idx_ctx_tokens)
        B = x_ctx.shape[0]
        x = self.predictor.embed(x_ctx)
        seq = repeat_token(
            self.predictor.mask_token_value().astype(self.dtype),
            (B, self.sequence_length),
        )
        seq = set_at_index_mm(seq, idx_ctx_tokens, x.astype(seq.dtype))
        decoded = self.predictor.decode_tokens(seq)
        return self.predictor_proj(self.predictor.decoder_norm(decoded))

    def target_representations_dense(self, images) -> jnp.ndarray:
        """Full-sequence EMA-encoder representations, ungathered (B, L, D)."""
        return self.encoder(images)

    def __call__(
        self,
        images: jnp.ndarray,
        idx_ctx_tokens: jnp.ndarray,
        idx_target_tokens: jnp.ndarray,
    ) -> jnp.ndarray:
        """Context-side forward: → predicted latents (B, T, D).

        Target representations come from the EMA target encoder, which is
        applied OUTSIDE the module (its params live in the train state's
        ``extra`` slot): see ``JEPATask.loss_and_metric_sums``.
        """
        x_ctx = self.encode_context(images, idx_ctx_tokens)
        return self.predict_targets(x_ctx, idx_ctx_tokens, idx_target_tokens)

    def target_representations(self, images, idx_target_tokens):
        """Full-sequence encode → gather target tokens (run with EMA params)."""
        tokens = self.encoder(images)
        return get_at_index_mm(tokens, idx_target_tokens)


def jepa_from_config(model_cfg: dict, jepa_cfg: dict, dtype=jnp.bfloat16,
                     attn_impl: str = "auto") -> JEPA:
    general = model_cfg.get("general", {})
    enc = model_cfg.get("encoder", {})
    return JEPA(
        image_size=general.get("image_size", 96),
        patch_size=general.get("patch_size", 8),
        in_chans=general.get("in_chans", 3),
        embed_dim=enc.get("embed_dim", 144),
        depth=enc.get("depth", 4),
        num_heads=enc.get("num_heads", 6),
        predictor_embed_dim=jepa_cfg.get("predictor_embed_dim", 96),
        predictor_depth=jepa_cfg.get("predictor_depth", 2),
        predictor_num_heads=jepa_cfg.get("predictor_num_heads", 6),
        dtype=dtype,
        attn_impl=attn_impl,
    )
