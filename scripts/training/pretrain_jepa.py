"""Self-supervised JEPA pretraining CLI (new capability; BASELINE config 4).

Mirrors the ``pretrain_mae`` CLI contract: flags ``--config / --resume_from /
--output_dir_suffix``; output layout ``outputs/pretrain/<suffix>/...``; final
weights export. The exported checkpoint exposes the context encoder under
``encoder``, so ``scripts.training.train_mae --encoder_ckpt`` consumes it
unchanged for the downstream probe.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)


def parse_args():
    parser = argparse.ArgumentParser(description="Self-supervised JEPA pretraining")
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument("--resume_from", type=str, default=None)
    parser.add_argument("--output_dir_suffix", type=str, default="jepa_pretrain")
    return parser.parse_args()


def main():
    args = parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config, save_config_snapshot
    from ssrl_vit_mae_jepa_tpu.data.loaders import get_pretrain_dataloaders
    from ssrl_vit_mae_jepa_tpu.training.jepa_task import JEPATask
    from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import save_checkpoint

    cfg = load_config(args.config)
    jepa_cfg = cfg["jepa"]
    model_cfg = cfg["model"]
    log_cfg = cfg["logging"]

    output_dir = Path(log_cfg["output_dir_base"]) / "pretrain" / args.output_dir_suffix
    (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    snapshot = save_config_snapshot(cfg, output_dir)
    print(f"📝 Saved config snapshot to: {snapshot}")

    # reuse the unlabeled-split pipeline; jepa section carries its own
    # batch/fraction/val_split knobs
    pre_like = dict(cfg)
    pre_like["pretrain"] = {**cfg["pretrain"], **jepa_cfg}
    train_loader, val_loader = get_pretrain_dataloaders(pre_like)

    task = JEPATask(model_cfg, jepa_cfg)
    trainer = Trainer(
        task,
        max_epochs=jepa_cfg["total_epochs"],
        output_dir=output_dir,
        seed=cfg.get("seed", 73),
        log_every_n_steps=log_cfg.get("log_every_n_steps"),
        ckpt_backend=log_cfg.get("ckpt_backend", "native"),
        periodic_ckpt_every=25,
        hyper_parameters={"model_cfg": model_cfg, "training_cfg": jepa_cfg},
    )
    trainer.fit(train_loader, val_loader, resume_from=args.resume_from)

    # terminal artifact: a genuinely torch-readable encoder state dict with
    # timm names (same torch.save contract as the MAE CLI — a .pt suffix
    # must be loadable by plain torch). The FULL JEPA state (context
    # encoder + predictor + EMA target) is kept alongside as a native
    # checkpoint for resume/analysis.
    import jax

    from ssrl_vit_mae_jepa_tpu.utils.torch_interop import export_reference_weights

    model_path = output_dir / log_cfg.get("jepa_model_path", "vit-jepa.pt")
    host_params = jax.device_get(trainer.state.params)
    if not export_reference_weights(model_path, {"encoder": host_params["encoder"]}):
        model_path = output_dir / "vit-jepa.ckpt"  # no torch: honest suffix
    save_checkpoint(
        output_dir / "jepa_state.ckpt",
        {"params": trainer.state.params, "target_encoder": trainer.state.extra},
        {"kind": "jepa_weights", "hyper_parameters": trainer.hyper_parameters},
    )
    if model_path.suffix == ".ckpt":
        save_checkpoint(
            model_path,
            {"params": trainer.state.params},
            {"kind": "jepa_weights", "hyper_parameters": trainer.hyper_parameters},
        )
    print("\n✅ JEPA pretraining complete")
    print(f"📦 Model weights saved to: {model_path}")
    print(f"🏁 Best checkpoint: {trainer.callbacks.best_path}")
    print(f"📈 Logs available at: {trainer.logger.jsonl_path}")


if __name__ == "__main__":
    main()
