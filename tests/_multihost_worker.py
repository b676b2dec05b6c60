"""Worker process for the executed multi-host test (tests/test_multihost.py).

Each worker: pins the CPU backend with 4 virtual devices, joins the
``jax.distributed`` coordinator via the ``SSRL_*`` env vars
(``parallel.multihost.maybe_initialize_distributed``), shards the epoch's
indices with ``process_local_indices``, and runs ONE real MAE training epoch
through the Trainer — whose prefetcher takes the multi-host ``global_batch``
branch because ``jax.process_count() > 1``. Prints the resulting train loss
for the parent test to compare against a single-process run.

Importing this module is side-effect-free (the test imports the shared
constants); all environment mutation happens inside ``main``.

Usage: python tests/_multihost_worker.py <data_dir> <out_dir>
(env: SSRL_COORDINATOR, SSRL_NUM_PROCESSES, SSRL_PROCESS_ID)
"""

import os
import sys

# must match the single-process reference in test_multihost.py
MODEL_CFG = {
    "general": {"image_size": 96, "patch_size": 16, "in_chans": 3},
    "encoder": {"embed_dim": 32, "depth": 1, "num_heads": 4},
    "decoder": {"decoder_embed_dim": 32, "decoder_depth": 1,
                "decoder_num_heads": 4},
}
PRETRAIN_CFG = {
    "mask_ratio_start": 0.75, "mask_ratio_end": 0.75, "mask_ramp_epochs": 1,
    "total_epochs": 1, "warmup_epochs": 1, "batch_size": 32,
    "base_learning_rate": 1.5e-4, "weight_decay": 0.05,
}
GLOBAL_EXAMPLES = 32  # one global batch per epoch

JEPA_CFG = {
    "total_epochs": 1, "warmup_epochs": 1, "batch_size": 32,
    "base_learning_rate": 1.5e-4, "weight_decay": 0.05,
    "predictor_embed_dim": 32, "predictor_depth": 1,
    "predictor_num_heads": 4, "num_target_blocks": 2,
    "ema_start": 0.996, "ema_end": 1.0,
}


def main() -> None:
    data_dir, out_dir = sys.argv[1], sys.argv[2]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "").strip()
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader
    from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
    from ssrl_vit_mae_jepa_tpu.parallel.multihost import (
        maybe_initialize_distributed,
        process_local_indices,
    )
    from ssrl_vit_mae_jepa_tpu.training.tasks import MAETask
    from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

    assert maybe_initialize_distributed(), "coordinator env vars not set"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4

    if os.environ.get("SSRL_WORKER_MODE") == "factory":
        # the CLI path: loader FACTORIES must shard indices per process and
        # divide the global batch themselves (data/loaders._shard_for_process)
        from ssrl_vit_mae_jepa_tpu.data.loaders import get_pretrain_dataloaders

        cfg = {"pretrain": {**PRETRAIN_CFG, "data_fraction": 1.0,
                            "val_split": 0.25},
               "seed": 73}
        train, val = get_pretrain_dataloaders(cfg, data_dir)
        assert train.batch_size == PRETRAIN_CFG["batch_size"] // 2
        print(f"MULTIHOST_SHARD={sorted(int(i) for i in train.indices)}",
              flush=True)
        mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
        task = MAETask(MODEL_CFG, PRETRAIN_CFG, dtype=jnp.float32)
        trainer = Trainer(
            task, max_epochs=1,
            output_dir=os.path.join(out_dir, f"f{jax.process_index()}"),
            mesh=mesh, enable_checkpointing=False,
        )
        metrics = trainer.fit(train, val)
        print(f"MULTIHOST_TRAIN_LOSS={metrics['train_loss']:.10f}", flush=True)
        return

    indices = process_local_indices(np.arange(GLOBAL_EXAMPLES))
    assert len(indices) == GLOBAL_EXAMPLES // 2

    ds = STL10(data_dir, "unlabeled")
    local_batch = GLOBAL_EXAMPLES // jax.process_count()
    loader = HostLoader(ds, indices, local_batch, shuffle=False)

    if os.environ.get("SSRL_WORKER_MODE") == "jepa":
        # JEPA across REAL processes: the EMA target params (TrainState.extra)
        # must stay replicated-consistent — every process applies the same
        # psum-ed-gradient update and the same EMA blend, so a checksum of
        # the EMA tree must match across ranks (VERDICT r3 #4).
        from ssrl_vit_mae_jepa_tpu.training.jepa_task import JEPATask

        mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
        task = JEPATask(MODEL_CFG, JEPA_CFG, dtype=jnp.float32)
        trainer = Trainer(
            task, max_epochs=1,
            output_dir=os.path.join(out_dir, f"j{jax.process_index()}"),
            mesh=mesh, enable_checkpointing=False,
        )
        metrics = trainer.fit(loader)
        ema_sum = sum(
            float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
            for leaf in jax.tree.leaves(trainer.state.extra)
        )
        online_sum = sum(
            float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
            for leaf in jax.tree.leaves(trainer.state.params["encoder"])
        )
        print(f"MULTIHOST_TRAIN_LOSS={metrics['train_loss']:.10f}", flush=True)
        print(f"MULTIHOST_PRED_STD={metrics['train_pred_std']:.10f}",
              flush=True)
        print(f"MULTIHOST_EMA_CHECKSUM={ema_sum:.10f}", flush=True)
        print(f"MULTIHOST_ONLINE_CHECKSUM={online_sum:.10f}", flush=True)
        return

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    task = MAETask(MODEL_CFG, PRETRAIN_CFG, dtype=jnp.float32)
    trainer = Trainer(
        task, max_epochs=1,
        output_dir=os.path.join(out_dir, f"p{jax.process_index()}"),
        mesh=mesh, enable_checkpointing=False,
    )
    metrics = trainer.fit(loader)
    print(f"MULTIHOST_TRAIN_LOSS={metrics['train_loss']:.10f}", flush=True)


if __name__ == "__main__":
    main()
