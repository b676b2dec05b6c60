"""Baseline ablation: random-init ViT (no pretraining) across label budgets.

Same external behavior as the reference ``scripts/ablation/
run_baseline_ablation.py``: trains ``scripts.training.train_mae`` WITHOUT any
checkpoint flags (→ random-init full fine-tune branch) for each label budget,
writing to ``outputs/train/mae_000_<k>``.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import yaml

BASE_CONFIG = Path(os.environ.get("SSRL_ABLATION_CONFIG", "configs/mae.yaml"))
# grid override for smoke tests / partial sweeps, e.g. SSRL_ABLATION_LABELS=4,8
BUDGETS = [
    int(x)
    for x in os.environ.get(
        "SSRL_ABLATION_LABELS", "10,25,50,100,200,300,400"
    ).split(",")
]


def run_cmd(cmd: list[str]):
    print("\n" + "=" * 80)
    print("📣 Running command:")
    print(" ".join(cmd))
    print("=" * 80)
    subprocess.run(cmd, check=True)


def main():
    for k in BUDGETS:
        print(f"\n\n🚀 Starting BASELINE run with {k} samples per class\n")

        cfg = yaml.safe_load(BASE_CONFIG.read_text())
        cfg["train"]["samples_per_class"] = k
        cfg["train"]["freeze_encoder"] = False
        cfg["train"].pop("unfreeze_last_layers", None)

        suffix = f"mae_000_{k}"
        out_dir = Path("outputs") / "train" / suffix
        out_dir.mkdir(parents=True, exist_ok=True)
        cfg_path = out_dir / "config.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        print(f"📝 Saved config for this run: {cfg_path}")

        if (out_dir / "checkpoints" / "best.ckpt").exists():
            print(f"⏩ SKIPPING {suffix} (already done)")
            continue

        cmd = [
            sys.executable, "-m", "scripts.training.train_mae",
            "--config", str(cfg_path),
            "--output_dir_suffix", suffix,
            # no --encoder_ckpt / --classifier_ckpt → random-init baseline
        ]
        run_cmd(cmd)

    print("\n🎉 Baseline ablation complete!")


if __name__ == "__main__":
    main()
