"""JEPA tests: masking invariants, model shapes, EMA semantics, learning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.config import _deep_merge
from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader
from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
from ssrl_vit_mae_jepa_tpu.models.jepa import jepa_from_config
from ssrl_vit_mae_jepa_tpu.ops.jepa_masking import block_shapes_for, sample_jepa_masks
from ssrl_vit_mae_jepa_tpu.training.jepa_task import JEPATask
from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

SMALL_MODEL = {
    "general": {"image_size": 96, "patch_size": 8, "in_chans": 3},
    "encoder": {"embed_dim": 48, "depth": 2, "num_heads": 4},
    "decoder": {"decoder_embed_dim": 48, "decoder_depth": 1, "decoder_num_heads": 4},
    "head": {"pool": "cls"},
}
SMALL_JEPA = {
    "total_epochs": 4, "warmup_epochs": 1, "batch_size": 16,
    "base_learning_rate": 5e-4, "weight_decay": 0.05,
    "predictor_embed_dim": 32, "predictor_depth": 1, "predictor_num_heads": 4,
    "num_target_blocks": 4, "target_scale": [0.15, 0.2],
    "target_aspect_ratio": [0.75, 1.5], "ema_start": 0.99, "ema_end": 1.0,
}


class TestJepaMasking:
    def test_block_shapes(self):
        shapes = block_shapes_for(24, (0.75, 1.5))
        assert all(h * w == 24 for h, w in shapes)
        assert all(0.75 <= h / w <= 1.5 for h, w in shapes)
        assert shapes  # non-empty

    def test_mask_invariants(self, rng):
        B, grid = 8, 12
        t_idx, c_idx = sample_jepa_masks(rng, B, grid, 4, 24, 48)
        assert t_idx.shape == (B, 96) and c_idx.shape == (B, 48)
        t, c = np.asarray(t_idx), np.asarray(c_idx)
        assert t.min() >= 0 and t.max() < 144
        assert c.min() >= 0 and c.max() < 144
        for b in range(B):
            # context never overlaps the target union
            assert not set(c[b]) & set(t[b])
            # context indices unique
            assert len(set(c[b])) == 48

    def test_blocks_are_rectangles(self, rng):
        B, grid = 4, 12
        t_idx, _ = sample_jepa_masks(rng, B, grid, 1, 24, 48)
        t = np.asarray(t_idx).reshape(B, 24)
        for b in range(B):
            ys, xs = t[b] // grid, t[b] % grid
            h = ys.max() - ys.min() + 1
            w = xs.max() - xs.min() + 1
            assert h * w == 24  # contiguous rectangle of area 24

    def test_block_context_sampling(self, rng):
        """context_sampling='block': context = square block minus targets.

        Geometry chosen so the block always holds ≥ context_size non-target
        patches (side=floor(12·√0.5)=8 → 64 cells, ≤4 targets, 48 needed),
        so every context patch must sit inside one 8×8 square.
        """
        B, grid = 8, 12
        t_idx, c_idx = sample_jepa_masks(
            rng, B, grid, 1, 4, 48,
            context_sampling="block", context_scale=(0.5, 0.5),
        )
        t, c = np.asarray(t_idx), np.asarray(c_idx)
        side = int(np.floor(grid * np.sqrt(0.5)))
        for b in range(B):
            assert not set(c[b]) & set(t[b])  # minus targets
            assert len(set(c[b])) == 48
            ys, xs = c[b] // grid, c[b] % grid
            assert ys.max() - ys.min() + 1 <= side, "context escapes block (rows)"
            assert xs.max() - xs.min() + 1 <= side, "context escapes block (cols)"

    def test_block_context_fills_from_outside_when_needed(self, rng):
        """When |block \\ targets| < context_size the sampler tops up from
        outside the block instead of picking targets."""
        B, grid = 4, 12
        # side=floor(12·√0.1)=3 → ≤9 in-block cells, need 20 → must fill
        t_idx, c_idx = sample_jepa_masks(
            rng, B, grid, 1, 4, 20,
            context_sampling="block", context_scale=(0.1, 0.1),
        )
        t, c = np.asarray(t_idx), np.asarray(c_idx)
        for b in range(B):
            assert not set(c[b]) & set(t[b])
            assert len(set(c[b])) == 20

    def test_unknown_context_sampling_rejected(self, rng):
        with pytest.raises(ValueError, match="context_sampling"):
            sample_jepa_masks(rng, 2, 12, 1, 4, 8, context_sampling="nope")


class TestJepaModel:
    def test_shapes(self, rng):
        model = jepa_from_config(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        B = 2
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (B, 96, 96, 3)), jnp.float32
        )
        t_idx, c_idx = sample_jepa_masks(rng, B, 12, 4, 24, 48)
        idx_ctx = jnp.concatenate(
            [jnp.zeros((B, 1), t_idx.dtype), c_idx + 1], axis=1
        )
        idx_tgt = t_idx + 1
        params = model.init(rng, imgs, idx_ctx, idx_tgt)["params"]
        assert "encoder" in params and "predictor" in params
        pred = model.apply({"params": params}, imgs, idx_ctx, idx_tgt)
        assert pred.shape == (B, 96, 48)
        tgt = model.apply(
            {"params": {"encoder": params["encoder"]}}, imgs, idx_tgt,
            method=model.target_representations,
        )
        assert tgt.shape == (B, 96, 48)


class TestJepaDenseLoss:
    def test_dense_loss_matches_gathered(self, monkeypatch):
        """SSRL_JEPA_DENSE_LOSS=1 ≡ the gathered latent-MSE path.

        Loss, collapse telemetry sums, AND context-side parameter grads
        must match the gathered formulation exactly (fp32, same RNG →
        same block draw; only the reduction structure differs)."""

        def run(dense: bool):
            monkeypatch.setenv("SSRL_JEPA_DENSE_LOSS", "1" if dense else "0")
            task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
            assert task.dense_loss is dense
            params = task.init_params(jax.random.PRNGKey(21))
            extra = task.init_extra(params)
            images = jnp.asarray(
                np.random.default_rng(9).uniform(-1, 1, (8, 96, 96, 3)),
                jnp.float32,
            )
            batch = {"weight": jnp.ones((8,), jnp.float32)}

            def f(p):
                loss, sums = task.loss_and_metric_sums(
                    p, images, batch, jax.random.PRNGKey(4), None, extra=extra
                )
                return loss, sums

            (loss, sums), grads = jax.value_and_grad(f, has_aux=True)(params)
            return loss, sums, grads

        loss_g, sums_g, grads_g = run(False)
        loss_d, sums_d, grads_d = run(True)
        np.testing.assert_allclose(loss_d, loss_g, rtol=1e-6)
        for k in sums_g:
            np.testing.assert_allclose(
                sums_d[k], sums_g[k], rtol=1e-5, atol=1e-7, err_msg=k
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=5e-5, atol=1e-7
            ),
            jax.device_get(grads_d), jax.device_get(grads_g),
        )


class TestJepaTask:
    def _loaders(self, synthetic_stl10_dir):
        ds = STL10(synthetic_stl10_dir, "unlabeled")
        train = HostLoader(ds, np.arange(96), 16, shuffle=True, seed=73)
        val = HostLoader(ds, np.arange(96, 128), 16, shuffle=False)
        return train, val

    def test_ema_update_semantics(self, synthetic_stl10_dir):
        task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        state = task.init_state(jax.random.PRNGKey(0))
        ema0 = jax.device_get(state.extra)
        p0 = jax.device_get(state.params["encoder"])
        jax.tree.map(np.testing.assert_array_equal, ema0, p0)  # starts equal
        ds = STL10(synthetic_stl10_dir, "unlabeled")
        batch = next(iter(HostLoader(ds, np.arange(16), 16, shuffle=False).epoch(0)))
        state, _ = task.train_step(state, batch, 0, None)
        ema1 = jax.device_get(state.extra)
        p1 = jax.device_get(state.params["encoder"])
        lhs = ema1["cls_token"]
        expect = 0.99 * ema0["cls_token"] + 0.01 * p1["cls_token"]
        np.testing.assert_allclose(lhs, expect, atol=1e-6)

    def test_per_step_ema_schedule(self, synthetic_stl10_dir):
        """With the epoch length known, EMA momentum anneals per STEP
        (I-JEPA), not per epoch."""
        task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        task.on_fit_start(steps_per_epoch=10)  # total_steps = 40
        state = task.init_state(jax.random.PRNGKey(0))
        ds = STL10(synthetic_stl10_dir, "unlabeled")
        batch = next(iter(HostLoader(ds, np.arange(16), 16, shuffle=False).epoch(0)))

        ema0 = jax.device_get(state.extra)["cls_token"]
        state, _ = task.train_step(state, batch, 0, None)
        p1 = jax.device_get(state.params["encoder"])["cls_token"]
        m1 = 0.99 + (1 / 40) * (1.0 - 0.99)  # post_update sees step=1
        np.testing.assert_allclose(
            jax.device_get(state.extra)["cls_token"],
            m1 * ema0 + (1 - m1) * p1, atol=1e-6,
        )

        ema1 = jax.device_get(state.extra)["cls_token"]
        state, _ = task.train_step(state, batch, 0, None)
        p2 = jax.device_get(state.params["encoder"])["cls_token"]
        m2 = 0.99 + (2 / 40) * (1.0 - 0.99)  # later step → larger momentum
        np.testing.assert_allclose(
            jax.device_get(state.extra)["cls_token"],
            m2 * ema1 + (1 - m2) * p2, atol=1e-6,
        )
        # logged momentum follows the same per-step schedule
        assert task.host_epoch_metrics(2)["ema_momentum"] == pytest.approx(
            0.99 + (20 / 40) * 0.01
        )

    def test_collapse_telemetry_logged(self, synthetic_stl10_dir, tmp_path):
        """Collapse diagnostics (pred/target std, pred-target cosine, EMA
        drift) are computed per step and land in metrics.jsonl — for a
        joint-embedding method a flat loss curve without these is exactly
        what partial collapse looks like (VERDICT r2 weak #2)."""
        import json

        train, val = self._loaders(synthetic_stl10_dir)
        task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        trainer = Trainer(
            task, max_epochs=1, output_dir=tmp_path / "jepa_tel",
            enable_checkpointing=False,
        )
        trainer.init_state()
        metrics = trainer.fit(train, val)
        for k in ("train_pred_std", "train_target_std", "train_pred_target_cos",
                  "train_ema_drift", "val_pred_std", "val_target_std",
                  "val_pred_target_cos"):
            assert k in metrics, (k, sorted(metrics))
        # healthy init: nonzero variance in both towers, finite cosine
        assert metrics["train_target_std"] > 1e-3
        assert metrics["train_pred_std"] > 1e-4
        assert -1.0 <= metrics["train_pred_target_cos"] <= 1.0
        assert metrics["train_ema_drift"] >= 0.0
        logged = [json.loads(line) for line in
                  (tmp_path / "jepa_tel" / "metrics.jsonl").read_text().splitlines()]
        assert any("train_pred_std" in rec for rec in logged)

    def test_loss_decreases(self, synthetic_stl10_dir, tmp_path):
        train, val = self._loaders(synthetic_stl10_dir)
        task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        trainer = Trainer(
            task, max_epochs=4, output_dir=tmp_path / "jepa",
            enable_checkpointing=True,
        )
        trainer.init_state()
        m0 = trainer.evaluate(val, prefix="val", epoch=0)
        metrics = trainer.fit(train, val)
        assert metrics["val_loss"] < m0["val_loss"], (m0, metrics)
        assert (tmp_path / "jepa/checkpoints/best.ckpt").exists()

    def test_downstream_encoder_loading(self, synthetic_stl10_dir, tmp_path):
        """JEPA checkpoints feed the probe path via the encoder subtree."""
        from ssrl_vit_mae_jepa_tpu.utils.checkpoint import save_checkpoint
        from ssrl_vit_mae_jepa_tpu.utils.load import encoder_params_from_checkpoint

        task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        state = task.init_state(jax.random.PRNGKey(0))
        p = tmp_path / "best.ckpt"
        save_checkpoint(p, state, {"epoch": 0})
        enc, report = encoder_params_from_checkpoint(p, depth=2)
        assert "cls_token" in enc and "blocks_1" in enc
        assert not report["missing"]


class TestJepaEvalWithExplicitParams:
    def test_trainer_test_with_params_only(self, synthetic_stl10_dir, tmp_path):
        """trainer.test(loader, params=...) must work for JEPA (the EMA
        target defaults to a copy of the given encoder via init_extra) —
        regression: extra stayed None and flax crashed on the target
        encoder apply."""
        from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

        task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        trainer = Trainer(task, max_epochs=1, output_dir=tmp_path,
                          enable_checkpointing=False)
        state = trainer.init_state()
        ds = STL10(synthetic_stl10_dir, "unlabeled")
        loader = HostLoader(ds, np.arange(32), 16, shuffle=False)
        metrics = trainer.test(loader, params=jax.device_get(state.params))
        assert np.isfinite(metrics["test_loss"])

    def test_evaluate_empty_loader_raises(self, synthetic_stl10_dir, tmp_path):
        from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

        task = JEPATask(SMALL_MODEL, SMALL_JEPA, dtype=jnp.float32)
        trainer = Trainer(task, max_epochs=1, output_dir=tmp_path,
                          enable_checkpointing=False)
        trainer.init_state()
        ds = STL10(synthetic_stl10_dir, "unlabeled")
        empty = HostLoader(ds, np.arange(0), 16, shuffle=False)
        with pytest.raises(ValueError, match="empty loader"):
            trainer.evaluate(empty)
