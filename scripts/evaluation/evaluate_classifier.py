"""Classifier evaluation CLI on the STL-10 test split.

Same contract as the reference ``scripts/evaluation/evaluate_classifier.py``:
``--config / --checkpoint`` flags, checkpoint defaulting to
``outputs/train/<suffix>/checkpoints/best.ckpt`` (reference ``:45-54``),
delegation to ``evaluate_checkpoint``. Reports top-1 and top-5.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from scripts.utils import (
    evaluate_checkpoint,
    setup_reproducibility,
    shut_down_warnings,
)

shut_down_warnings()
setup_reproducibility(seed=73)


def parse_args():
    parser = argparse.ArgumentParser(
        description="Evaluate MAE classifier on STL-10 test set"
    )
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument(
        "--checkpoint", type=str, default=None,
        help="Path to checkpoint (.ckpt) — defaults to best.ckpt in training output dir",
    )
    return parser.parse_args()


def main():
    args = parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config
    from ssrl_vit_mae_jepa_tpu.data.loaders import get_test_dataloader

    cfg = load_config(args.config)
    log_cfg = cfg["logging"]
    train_cfg = cfg["train"]

    if args.checkpoint is None:
        default_ckpt = (
            Path(log_cfg["output_dir_base"])
            / "train"
            / train_cfg.get("output_dir_suffix", "default")
            / "checkpoints"
            / "best.ckpt"
        )
        args.checkpoint = str(default_ckpt)
        print(f"🧩 Using default checkpoint: {args.checkpoint}")

    test_loader = get_test_dataloader(cfg)
    acc = evaluate_checkpoint(cfg, args.checkpoint, test_loader)

    print("\n✅ Evaluation complete")
    print(f"📈 Accuracy: {acc}")


if __name__ == "__main__":
    main()
