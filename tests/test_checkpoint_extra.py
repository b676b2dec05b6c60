"""Orbax backend + checkpoint policy tests."""

import numpy as np

import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.utils.checkpoint import (
    CheckpointCallbacks,
    load_checkpoint,
    save_checkpoint,
)
from ssrl_vit_mae_jepa_tpu.utils.orbax_io import (
    is_orbax_checkpoint,
    load_orbax,
    save_orbax,
)


class TestOrbaxBackend:
    def test_roundtrip(self, tmp_path):
        state = {
            "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.int32(7),
        }
        p = save_orbax(tmp_path / "ck", state, {"epoch": 3})
        assert is_orbax_checkpoint(p)
        loaded, meta = load_orbax(p)
        assert meta["epoch"] == 3
        np.testing.assert_array_equal(loaded["params"]["w"], state["params"]["w"])


class TestCheckpointPolicies:
    def _cb(self, tmp_path, monitor="val_loss", mode="min", periodic=2):
        return CheckpointCallbacks(
            tmp_path, monitor=monitor, mode=mode, periodic_every=periodic
        )

    def test_best_min_and_periodic(self, tmp_path):
        cb = self._cb(tmp_path)
        state = {"params": {"w": jnp.zeros(2)}}
        cb.on_epoch_end(0, {"val_loss": 1.0}, state, {}, state)
        cb.on_epoch_end(1, {"val_loss": 0.5}, state, {}, state)  # improved + periodic
        cb.on_epoch_end(2, {"val_loss": 0.9}, state, {}, state)  # not improved
        assert cb.best_score == 0.5
        assert (tmp_path / "best.ckpt").exists()
        assert (tmp_path / "last.ckpt").exists()
        assert (tmp_path / "epoch-001.ckpt").exists()
        assert not (tmp_path / "epoch-000.ckpt").exists()
        _, meta = load_checkpoint(tmp_path / "best.ckpt")
        assert meta["epoch"] == 1
        assert meta["callbacks"]["best_model_score"] == 0.5

    def test_best_max_mode(self, tmp_path):
        cb = self._cb(tmp_path, monitor="val_acc", mode="max", periodic=None)
        state = {"params": {"w": jnp.zeros(2)}}
        cb.on_epoch_end(0, {"val_acc": 0.3}, state, {})
        cb.on_epoch_end(1, {"val_acc": 0.2}, state, {})
        cb.on_epoch_end(2, {"val_acc": 0.7}, state, {})
        assert cb.best_score == 0.7
        _, meta = load_checkpoint(tmp_path / "best.ckpt")
        assert meta["epoch"] == 2

    def test_atomic_overwrite(self, tmp_path):
        p = tmp_path / "x.ckpt"
        save_checkpoint(p, {"a": np.ones(3)}, {"v": 1})
        save_checkpoint(p, {"a": np.zeros(3)}, {"v": 2})
        state, meta = load_checkpoint(p)
        assert meta["v"] == 2
        np.testing.assert_array_equal(state["a"], np.zeros(3))
        assert not p.with_suffix(".ckpt.tmp").exists()


class TestRankBookkeeping:
    """Non-writing ranks mirror best_score/best_path via record_epoch
    (ADVICE r3: scripts that print trainer.callbacks.best_path run on all
    processes and must not see a stale None on ranks > 0)."""

    def test_record_epoch_tracks_best_without_writing(self, tmp_path):
        from ssrl_vit_mae_jepa_tpu.utils.checkpoint import CheckpointCallbacks

        writer = CheckpointCallbacks(tmp_path / "w", monitor="val_loss",
                                     mode="min")
        mirror = CheckpointCallbacks(tmp_path / "w", monitor="val_loss",
                                     mode="min")
        state = {"params": {"w": np.ones(3, np.float32)}}
        for epoch, val in enumerate([1.0, 0.5, 0.8]):
            writer.on_epoch_end(epoch, {"val_loss": val}, state,
                                meta_base={"global_step": epoch})
            mirror.record_epoch(epoch, {"val_loss": val})
            assert mirror.best_score == writer.best_score
            assert mirror.best_path == writer.best_path
        # the mirror never touched the filesystem beyond what the writer made
        assert (tmp_path / "w" / "best.ckpt").exists()
        assert writer.best_score == 0.5

    def test_weights_only_alias_contract_asserts(self, tmp_path):
        """Non-aliased weights_only_state leaves fail loudly instead of
        silently double-fetching over the relay (ADVICE r3)."""
        import pytest as _pytest

        from ssrl_vit_mae_jepa_tpu.utils.checkpoint import CheckpointCallbacks

        cb = CheckpointCallbacks(tmp_path / "c", monitor="val_loss",
                                 mode="min", periodic_every=1)
        params = {"w": np.ones(3, np.float32)}
        state = {"params": params}
        # aliased: fine
        cb.on_epoch_end(0, {"val_loss": 1.0}, state,
                        meta_base={}, weights_only_state={"params": params})
        # re-wrapped copy: the identity contract is broken -> assert fires
        with _pytest.raises(AssertionError, match="alias"):
            cb.on_epoch_end(
                1, {"val_loss": 0.9}, state, meta_base={},
                weights_only_state={"params": {"w": np.ones(3, np.float32)}},
            )
