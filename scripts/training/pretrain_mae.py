"""Self-supervised MAE pretraining CLI.

Same external contract as the reference ``scripts/training/pretrain_mae.py``:
flags ``--config / --resume_from / --output_dir_suffix``; output layout
``outputs/pretrain/<suffix>/{checkpoints,logs,config.yaml}``; checkpoint
policies best-by-val_loss / last-every-epoch / weights-only every 25 epochs
(reference ``:85-109``); final raw weights export to
``<out>/<logging.model_path>`` (reference ``:133-134``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)


def parse_args():
    parser = argparse.ArgumentParser(description="Self-supervised MAE pretraining")
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="Path to checkpoint to resume from",
    )
    parser.add_argument(
        "--output_dir_suffix", type=str, default="mae_pretrain",
        help="Suffix for the output directory",
    )
    return parser.parse_args()


def main():
    args = parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config, save_config_snapshot
    from ssrl_vit_mae_jepa_tpu.data.loaders import get_pretrain_dataloaders
    from ssrl_vit_mae_jepa_tpu.training.tasks import MAETask
    from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import save_checkpoint

    cfg = load_config(args.config)
    pre_cfg = cfg["pretrain"]
    model_cfg = cfg["model"]
    log_cfg = cfg["logging"]

    output_dir = Path(log_cfg["output_dir_base"]) / "pretrain" / args.output_dir_suffix
    (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    snapshot = save_config_snapshot(cfg, output_dir)
    print(f"📝 Saved config snapshot to: {snapshot}")

    train_loader, val_loader = get_pretrain_dataloaders(cfg)

    task = MAETask(model_cfg, pre_cfg)
    trainer = Trainer(
        task,
        max_epochs=pre_cfg["total_epochs"],
        output_dir=output_dir,
        seed=cfg.get("seed", 73),
        log_every_n_steps=log_cfg.get("log_every_n_steps"),
        ckpt_backend=log_cfg.get("ckpt_backend", "native"),
        periodic_ckpt_every=25,
        hyper_parameters={"model_cfg": model_cfg, "training_cfg": pre_cfg},
    )
    trainer.fit(train_loader, val_loader, resume_from=args.resume_from)

    # terminal artifact: a torch-readable state dict with reference names
    # (reference :133-134 torch.save contract); native fallback if torch absent
    from ssrl_vit_mae_jepa_tpu.utils.torch_interop import export_reference_weights

    model_path = output_dir / log_cfg["model_path"]
    import jax

    if not export_reference_weights(model_path, jax.device_get(trainer.state.params)):
        save_checkpoint(
            model_path,
            {"params": trainer.state.params},
            {"kind": "mae_weights", "hyper_parameters": trainer.hyper_parameters},
        )
    print("\n✅ Pretraining complete")
    print(f"📦 Model weights saved to: {model_path}")
    print(f"🏁 Best checkpoint: {trainer.callbacks.best_path}")
    print(f"📈 Logs available at: {trainer.logger.jsonl_path}")


if __name__ == "__main__":
    main()
