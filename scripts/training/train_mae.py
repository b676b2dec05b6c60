"""Supervised training / fine-tuning CLI (probe, partial unfreeze, full).

Same external contract as the reference ``scripts/training/train_mae.py``:
three init branches — (a) ``--classifier_ckpt`` full-classifier continuation,
(b) ``--encoder_ckpt`` pretrained encoder with prefix detection
(``model.encoder.`` / ``encoder.`` / ``module.encoder.``, reference
``:104-124``), (c) neither → random ViT baseline — followed by the freeze
policy override precedence ``unfreeze_last_layers > freeze_encoder >
unfreeze`` (reference ``:166-176``); best checkpoint by max ``val_acc``
(quirk Q10); raw weights export (reference ``:222-223``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)


def parse_args():
    parser = argparse.ArgumentParser(
        description="Fine-tune or train MAE encoder on classification task"
    )
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument(
        "--encoder_ckpt", type=str, default=None,
        help="Path to pretrained MAE encoder weights (.pt or .ckpt)",
    )
    parser.add_argument(
        "--classifier_ckpt", type=str, default=None,
        help="Path to full classifier checkpoint (for fine-tuning continuation)",
    )
    parser.add_argument(
        "--output_dir_suffix", type=str, default="mae_finetune",
        help="Suffix for the output directory",
    )
    return parser.parse_args()


def main():
    args = parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config, save_config_snapshot
    from ssrl_vit_mae_jepa_tpu.data.loaders import get_train_dataloaders
    from ssrl_vit_mae_jepa_tpu.training.tasks import ClassifierTask
    from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import save_checkpoint
    from ssrl_vit_mae_jepa_tpu.utils.load import (
        classifier_params_from_checkpoint,
        encoder_params_from_checkpoint,
        merge_encoder,
    )

    cfg = load_config(args.config)
    model_cfg = cfg["model"]
    train_cfg = cfg["train"]
    log_cfg = cfg["logging"]
    depth = model_cfg["encoder"]["depth"]

    output_dir = Path(log_cfg["output_dir_base"]) / "train" / args.output_dir_suffix
    (output_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    snapshot = save_config_snapshot(cfg, output_dir)
    print(f"📝 Saved config snapshot to: {snapshot}")

    train_loader, val_loader = get_train_dataloaders(cfg)

    task = ClassifierTask(model_cfg, train_cfg)
    params_override = None
    if args.classifier_ckpt:
        print(f"🔁 Loading full classifier checkpoint: {args.classifier_ckpt}")
        loaded, report, _ = classifier_params_from_checkpoint(
            args.classifier_ckpt, depth
        )
        if report["missing"]:
            print(f"⚠️ {len(report['missing'])} missing keys (loaded non-strict)")
        params_override = lambda p: loaded  # noqa: E731
    elif args.encoder_ckpt:
        print(f"🧩 Loading pretrained encoder: {args.encoder_ckpt}")
        enc_params, _ = encoder_params_from_checkpoint(args.encoder_ckpt, depth)
        params_override = lambda p: merge_encoder(p, enc_params)  # noqa: E731
    else:
        print("🧪 Baseline: random-initialized VisionTransformer (no MAE)")

    # Freeze policy override precedence (reference train_mae.py:166-176)
    if train_cfg.get("unfreeze_last_layers", None) is not None:
        n_layers = int(train_cfg["unfreeze_last_layers"])
        print(f"🧠 Unfreezing {n_layers} encoder layers...")
        task.set_freeze_policy(unfreeze_last_layers=n_layers)
    elif train_cfg.get("freeze_encoder", True):
        print("🧊 Freezing encoder weights...")
        task.set_freeze_policy(freeze_encoder=True)
    else:
        print("🧠 Unfreezing encoder weights...")
        task.set_freeze_policy(freeze_encoder=False)

    trainer = Trainer(
        task,
        max_epochs=train_cfg["total_epochs"],
        output_dir=output_dir,
        seed=cfg.get("seed", 73),
        log_every_n_steps=log_cfg.get("log_every_n_steps"),
        ckpt_backend=log_cfg.get("ckpt_backend", "native"),
        hyper_parameters={"model_cfg": model_cfg, "training_cfg": train_cfg},
    )
    trainer.init_state(params_override)
    trainer.fit(train_loader, val_loader)

    # terminal artifact: torch-readable classifier state dict (reference
    # train_mae.py:222-223 torch.save contract); native fallback if torch absent
    from ssrl_vit_mae_jepa_tpu.utils.torch_interop import export_reference_weights

    model_path = output_dir / log_cfg["model_path"]
    import jax

    if not export_reference_weights(model_path, jax.device_get(trainer.state.params)):
        save_checkpoint(
            model_path,
            {"params": trainer.state.params},
            {"kind": "classifier_weights", "hyper_parameters": trainer.hyper_parameters},
        )
    print("\n✅ Training complete")
    print(f"📦 Model weights saved to: {model_path}")
    print(f"🏁 Best checkpoint: {trainer.callbacks.best_path}")
    print(f"📈 Logs available at: {trainer.logger.jsonl_path}")


if __name__ == "__main__":
    main()
