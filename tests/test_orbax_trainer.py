"""Trainer with the orbax checkpoint backend: save policies + resume."""

import jax
import jax.numpy as jnp
import numpy as np

from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader
from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
from ssrl_vit_mae_jepa_tpu.training.tasks import ClassifierTask
from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer
from ssrl_vit_mae_jepa_tpu.utils.orbax_io import is_orbax_checkpoint

SMALL_MODEL = {
    "general": {"image_size": 96, "patch_size": 8, "in_chans": 3},
    "encoder": {"embed_dim": 32, "depth": 1, "num_heads": 4},
    "decoder": {"decoder_embed_dim": 32, "decoder_depth": 1, "decoder_num_heads": 4},
    "head": {"pool": "cls"},
}
TRAIN_CFG = {
    "freeze_encoder": True, "learning_rate": 1e-3, "warmup_epochs": 1,
    "total_epochs": 3, "weight_decay": 0.05, "batch_size": 16,
}


def test_orbax_backend_fit_and_resume(synthetic_stl10_dir, tmp_path):
    ds = STL10(synthetic_stl10_dir, "train")
    loader = HostLoader(ds, np.arange(32), 16, shuffle=True, seed=73)

    task = ClassifierTask(SMALL_MODEL, TRAIN_CFG, dtype=jnp.float32)
    t1 = Trainer(task, 2, tmp_path / "a", ckpt_backend="orbax")
    t1.fit(loader, loader)
    last = tmp_path / "a/checkpoints/last.ckpt"
    assert is_orbax_checkpoint(last)

    task2 = ClassifierTask(SMALL_MODEL, TRAIN_CFG, dtype=jnp.float32)
    t2 = Trainer(task2, 3, tmp_path / "b", ckpt_backend="orbax")
    t2.init_state()
    start = t2._resume(last)
    assert start == 2
    p1 = jax.device_get(t1.state.params)
    p2 = jax.device_get(t2.state.params)
    jax.tree.map(np.testing.assert_array_equal, p1, p2)
