"""Classifier evaluation CLI on the STL-10 test split.

Contract (SURVEY.md §3.3; reference behavior at
``scripts/evaluation/evaluate_classifier.py:30-54``): ``--config`` /
``--checkpoint`` flags; when no checkpoint is given, fall back to
``<outputs>/train/<suffix>/checkpoints/best.ckpt`` derived from the config;
delegate scoring to ``scripts.utils.evaluate_checkpoint`` (which accepts all
four checkpoint flavors). Reports top-1 and top-5 accuracy.
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


def default_checkpoint(cfg: dict) -> Path:
    """Best checkpoint of the training run this config describes.

    Reference contract first (``train.output_dir_suffix`` config key,
    reference ``evaluate_classifier.py:45-54``) — but no config nor
    training CLI ever writes that key, so when the contract path doesn't
    exist fall back to the train CLI's own argparse default suffix
    (``mae_finetune``), which is where a flagless
    ``python -m scripts.training.train_mae`` actually saved.
    """
    root = Path(cfg["logging"]["output_dir_base"])
    suffix = cfg["train"].get("output_dir_suffix", "default")
    contract = root / "train" / suffix / "checkpoints" / "best.ckpt"
    if contract.exists():
        return contract
    fallback = root / "train" / "mae_finetune" / "checkpoints" / "best.ckpt"
    return fallback if fallback.exists() else contract


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Score a trained ViT classifier on the STL-10 test set")
    parser.add_argument("--config", default="configs/mae.yaml")
    parser.add_argument(
        "--checkpoint", default=None,
        help="checkpoint to evaluate (.ckpt or .pt); defaults to the "
             "config's training run's best.ckpt")
    args = parser.parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config
    from ssrl_vit_mae_jepa_tpu.data.loaders import get_test_dataloader

    cfg = load_config(args.config)
    ckpt = args.checkpoint or str(default_checkpoint(cfg))
    if args.checkpoint is None:
        print(f"No --checkpoint given; evaluating {ckpt}")

    accuracy = evaluate_checkpoint(cfg, ckpt, get_test_dataloader(cfg))
    print(f"Evaluation complete — accuracy: {accuracy}")


if __name__ == "__main__":
    main()
