"""Smoke tests for the visualization / sweep-analysis scripts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.config import DEFAULTS, _deep_merge
from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask
from ssrl_vit_mae_jepa_tpu.utils.checkpoint import save_checkpoint

SMALL_MODEL = {
    "general": {"image_size": 96, "patch_size": 8, "in_chans": 3},
    "encoder": {"embed_dim": 48, "depth": 2, "num_heads": 4},
    "decoder": {"decoder_embed_dim": 48, "decoder_depth": 1, "decoder_num_heads": 4},
    "head": {"embed_dim": 48, "pool": "cls"},
}


@pytest.fixture(scope="module")
def small_cfg():
    return _deep_merge(DEFAULTS, {"model": SMALL_MODEL})


@pytest.fixture(scope="module")
def mae_ckpt(tmp_path_factory):
    from ssrl_vit_mae_jepa_tpu.models import mae_from_config

    rng = jax.random.PRNGKey(0)
    mae = mae_from_config(SMALL_MODEL, dtype=jnp.float32)
    idx_keep, idx_mask = random_token_mask(rng, 1, 145, 108)
    params = mae.init(
        rng, jnp.zeros((1, 96, 96, 3)), idx_keep, idx_mask
    )["params"]
    p = tmp_path_factory.mktemp("w") / "mae.ckpt"
    save_checkpoint(p, {"params": params}, {"kind": "mae_weights"})
    return p


class TestReconstruction:
    def test_reconstruct_batch(self, small_cfg, mae_ckpt, synthetic_stl10_dir):
        from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
        from scripts.evaluation.visualize_reconstruction import reconstruct_batch

        ds = STL10(synthetic_stl10_dir, "train")
        out = reconstruct_batch(small_cfg, mae_ckpt, ds.images_nhwc(np.arange(4)))
        for key in ("original", "masked", "reconstructed"):
            assert out[key].shape == (4, 96, 96, 3)
            assert out[key].min() >= 0 and out[key].max() <= 1
        assert np.isfinite(out["mse"]) and np.isfinite(out["psnr"])
        # masked image: exactly 108 of 144 patches are gray (0.5)
        img = out["masked"][0]
        patches = img.reshape(12, 8, 12, 8, 3).transpose(0, 2, 1, 3, 4)
        gray = sum(
            1
            for gy in range(12)
            for gx in range(12)
            if np.allclose(patches[gy, gx], 0.5, atol=1e-3)
        )
        assert gray >= 100  # ~108 modulo synthetic patches that are truly gray

    def test_reconstruction_is_deterministic(self, small_cfg, mae_ckpt,
                                             synthetic_stl10_dir):
        from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
        from scripts.evaluation.visualize_reconstruction import reconstruct_batch

        ds = STL10(synthetic_stl10_dir, "train")
        imgs = ds.images_nhwc(np.arange(2))
        a = reconstruct_batch(small_cfg, mae_ckpt, imgs)
        b = reconstruct_batch(small_cfg, mae_ckpt, imgs)
        np.testing.assert_array_equal(a["masked"], b["masked"])  # fixed seed 42


class TestRepresentation:
    def test_extract_and_project(self, small_cfg, mae_ckpt, synthetic_stl10_dir):
        from scripts.evaluation.visualize_representation import (
            extract_features,
            project_2d,
        )

        feats, labels = extract_features(
            small_cfg, mae_ckpt, pool="cls", normalize="l2",
            split="test", data_dir=synthetic_stl10_dir,
        )
        assert feats.shape == (40, 48)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
        xy = project_2d(feats[:30], method="tsne")
        assert xy.shape == (30, 2)

    def test_umap_runs_without_umap_learn(self):
        """--method umap (the reference default) executes via the built-in
        numpy UMAP when umap-learn is absent, and separates clusters."""
        from scripts.evaluation.visualize_representation import project_2d

        rng = np.random.default_rng(0)
        centers = rng.normal(0, 6, (3, 16))
        feats = np.concatenate(
            [c + rng.normal(0, 0.4, (40, 16)) for c in centers]
        ).astype(np.float32)
        y = np.repeat(np.arange(3), 40)
        xy = project_2d(feats, method="umap")
        assert xy.shape == (120, 2)
        cents = np.stack([xy[y == c].mean(0) for c in range(3)])
        pred = np.argmin(((xy[:, None] - cents[None]) ** 2).sum(-1), axis=1)
        assert (pred == y).mean() > 0.9

    def test_mean_pool_excludes_cls(self, small_cfg, mae_ckpt, synthetic_stl10_dir):
        """Viz mean pool excludes CLS (quirk Q6) — differs from classifier."""
        from scripts.evaluation.visualize_representation import extract_features

        f_cls, _ = extract_features(
            small_cfg, mae_ckpt, pool="cls", split="test",
            data_dir=synthetic_stl10_dir,
        )
        f_mean, _ = extract_features(
            small_cfg, mae_ckpt, pool="mean", split="test",
            data_dir=synthetic_stl10_dir,
        )
        assert not np.allclose(f_cls, f_mean)


class TestValAccByMode:
    def test_best_score_readback(self, tmp_path):
        from scripts.evaluation.visualize_val_acc_by_mode import (
            best_score_from_checkpoint,
        )

        p = tmp_path / "best.ckpt"
        save_checkpoint(
            p, {"params": {"x": np.zeros(2)}},
            {"callbacks": {"best_model_score": 0.731}},
        )
        assert best_score_from_checkpoint(p) == pytest.approx(0.731)


class TestKnnEval:
    def test_random_encoder_respects_config_image_size(self, synthetic_stl10_dir):
        """random_encoder_features must transform to the CONFIG's image_size:
        with image_size != 96 the ViT's pos-embed length only matches when
        eval_transform resizes to the configured size (regression: the
        transform was hardcoded to its 96px default and crashed)."""
        from scripts.evaluation.knn_eval import random_encoder_features

        cfg = _deep_merge(DEFAULTS, {"model": {
            "general": {"image_size": 32, "patch_size": 8, "in_chans": 3},
            "encoder": {"embed_dim": 48, "depth": 1, "num_heads": 4},
        }})
        feats, labels = random_encoder_features(
            cfg, "cls", "test", batch_size=16, data_dir=synthetic_stl10_dir
        )
        assert feats.shape == (40, 48)
        assert labels.shape == (40,)
