"""Unit tests for the model family: ViT, MAE, classifier."""

import jax
import jax.numpy as jnp
import numpy as np

from ssrl_vit_mae_jepa_tpu.config import DEFAULTS
from ssrl_vit_mae_jepa_tpu.models import (
    classifier_from_config,
    mae_from_config,
    vit_from_config,
)
from ssrl_vit_mae_jepa_tpu.ops.masking import num_masked_tokens, random_token_mask

MODEL_CFG = DEFAULTS["model"]


def _images(b=2, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(-1, 1, (b, 96, 96, 3)).astype(np.float32)
    )


class TestViT:
    def test_forward_features_shape(self, rng):
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32)
        params = vit.init(rng, _images(1))
        out = vit.apply(params, _images(2))
        assert out.shape == (2, 145, 144)  # 12*12 patches + CLS

    def test_masked_path_shape(self, rng):
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32)
        idx_keep, _ = random_token_mask(rng, 2, 145, 108)
        params = vit.init(rng, _images(1), idx_keep[:1])
        out = vit.apply(params, _images(2), idx_keep)
        assert out.shape == (2, 37, 144)

    def test_masked_equals_full_on_kept_tokens_single_block_identity(self, rng):
        """Encoding kept tokens only must equal gathering them pre-blocks:
        verify the pos-embed-then-gather ordering (lightly contract)."""
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32)
        params = vit.init(rng, _images(1))
        imgs = _images(2)
        # idx_keep = all tokens → masked path must equal full path exactly
        idx_all = jnp.tile(jnp.arange(145)[None, :], (2, 1))
        full = vit.apply(params, imgs)
        masked = vit.apply(params, imgs, idx_all)
        np.testing.assert_allclose(np.asarray(full), np.asarray(masked), atol=1e-5)

    def test_param_tree_names(self, rng):
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32)
        params = vit.init(rng, _images(1))["params"]
        for key in ["cls_token", "pos_embed", "patch_embed", "norm", "blocks_0",
                    "blocks_3"]:
            assert key in params, sorted(params)
        blk = params["blocks_0"]
        assert set(blk) == {"norm1", "attn", "norm2", "mlp"}
        assert set(blk["attn"]) == {"qkv", "proj"}
        assert set(blk["mlp"]) == {"fc1", "fc2"}
        assert params["pos_embed"].shape == (1, 145, 144)

    def test_param_count_close_to_reference(self, rng):
        """Classifier ≈1.1 M params (reference notebook cell 24)."""
        clf = classifier_from_config(MODEL_CFG)
        params = clf.init(rng, _images(1))["params"]
        n = sum(x.size for x in jax.tree.leaves(params))
        assert 0.9e6 < n < 1.3e6, n


class TestMAE:
    def test_forward_shapes(self, rng):
        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        B, L = 2, mae.sequence_length
        n_mask = num_masked_tokens(L, 0.75)
        idx_keep, idx_mask = random_token_mask(rng, B, L, n_mask)
        params = mae.init(rng, _images(B), idx_keep, idx_mask)
        pred, target = mae.apply(params, _images(B), idx_keep, idx_mask)
        assert pred.shape == (B, 108, 192)
        assert target.shape == (B, 108, 192)

    def test_target_is_masked_pixels(self, rng):
        """Targets must be the patchified pixels at clamp(idx_mask-1, 0) — Q7."""
        from ssrl_vit_mae_jepa_tpu.ops.patches import patchify

        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        B, L = 2, mae.sequence_length
        n_mask = num_masked_tokens(L, 0.75)
        idx_keep, idx_mask = random_token_mask(rng, B, L, n_mask)
        imgs = _images(B)
        params = mae.init(rng, imgs, idx_keep, idx_mask)
        _, target = mae.apply(params, imgs, idx_keep, idx_mask)
        patches = np.asarray(patchify(imgs, 8))
        idx = np.asarray(idx_mask)
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(target[b]), patches[b][idx[b] - 1], rtol=1e-6
            )

    def test_patch_tokens_input_matches_images(self, rng):
        """Passing pre-patchified (B, N, p·p·C) tokens ≡ passing images.

        The round-5 fused augment→patchify train path relies on the ndim==3
        passthrough producing identical (pred, target) — including the
        internally patchified loss target."""
        from ssrl_vit_mae_jepa_tpu.ops.patches import patchify

        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        B, L = 2, mae.sequence_length
        n_mask = num_masked_tokens(L, 0.75)
        idx_keep, idx_mask = random_token_mask(rng, B, L, n_mask)
        imgs = _images(B)
        params = mae.init(rng, imgs, idx_keep, idx_mask)
        pred_i, targ_i = mae.apply(params, imgs, idx_keep, idx_mask)
        tokens = patchify(imgs, 8)
        pred_p, targ_p = mae.apply(params, tokens, idx_keep, idx_mask)
        np.testing.assert_array_equal(np.asarray(targ_p), np.asarray(targ_i))
        np.testing.assert_allclose(
            np.asarray(pred_p), np.asarray(pred_i), rtol=1e-6, atol=1e-7
        )
        # ViT features too (classifier/JEPA consume this path)
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32)
        vparams = vit.init(rng, imgs)
        np.testing.assert_allclose(
            np.asarray(vit.apply(vparams, tokens)),
            np.asarray(vit.apply(vparams, imgs)),
            rtol=1e-6, atol=1e-7,
        )

    def test_grad_flows(self, rng):
        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        B, L = 2, mae.sequence_length
        n_mask = num_masked_tokens(L, 0.75)
        idx_keep, idx_mask = random_token_mask(rng, B, L, n_mask)
        imgs = _images(B)
        params = mae.init(rng, imgs, idx_keep, idx_mask)

        def loss_fn(p):
            pred, target = mae.apply(p, imgs, idx_keep, idx_mask)
            return jnp.mean((pred - target) ** 2)

        g = jax.grad(loss_fn)(params)
        gnorm = sum(float(jnp.sum(x**2)) for x in jax.tree.leaves(g))
        assert gnorm > 0


class TestClassifier:
    def test_logits_shape_and_dtype(self, rng):
        clf = classifier_from_config(MODEL_CFG, dtype=jnp.float32)
        params = clf.init(rng, _images(1))
        logits = clf.apply(params, _images(4))
        assert logits.shape == (4, 10)
        assert logits.dtype == jnp.float32

    def test_mean_pool_includes_cls(self, rng):
        """Quirk Q6: mean pooling averages over all 145 tokens incl. CLS."""
        cfg = {**MODEL_CFG, "head": {"pool": "mean"}}
        clf = classifier_from_config(cfg, dtype=jnp.float32)
        params = clf.init(rng, _images(1))
        imgs = _images(2)
        feats = clf.apply(params, imgs, method=clf.features)
        # recompute from the encoder tokens directly
        tokens = clf.apply(
            params, imgs, method=lambda m, x: m.encoder(x)
        )
        np.testing.assert_allclose(
            np.asarray(feats), np.asarray(tokens.mean(axis=1)), atol=1e-5
        )

    def test_head_only_param_subtree(self, rng):
        clf = classifier_from_config(MODEL_CFG)
        params = clf.init(rng, _images(1))["params"]
        assert set(params) == {"encoder", "head"}
        assert "classification" in params["head"]
