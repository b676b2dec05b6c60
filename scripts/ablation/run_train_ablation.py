"""Downstream fine-tuning ablation driver (the 112-run grid).

Same external behavior as the reference ``scripts/ablation/
run_train_ablation.py``: for each pretrain fraction × label budget, runs the
four fine-tuning stages in a CHAIN — ``frozen`` loads the pretrain best via
``--encoder_ckpt``; ``unfreeze1`` / ``unfreeze2`` / ``full`` each load the
previous stage's best via ``--classifier_ckpt`` (reference ``:73-91``) —
with the per-mode learning rates (frozen 3e-4, unfreeze1 1e-4, unfreeze2
5e-5, full 5e-5; reference ``:35-40``), skip-if-done, and continue-on-error.
Output dirs follow the ``mae_<frac>_<labels>_<mode>`` scheme consumed by the
viz/harvest tooling.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import yaml

BASE_CONFIG: Path = Path(os.environ.get("SSRL_ABLATION_CONFIG", "configs/mae.yaml"))

# grid overrides for smoke tests / partial sweeps
PRETRAIN_FRACTIONS: dict[int, str] = {
    int(x): f"mae_{int(x):03d}"
    for x in os.environ.get("SSRL_ABLATION_FRACTIONS", "100,75,50,25").split(",")
}
LABELS_PER_CLASS: list[int] = [
    int(x)
    for x in os.environ.get(
        "SSRL_ABLATION_LABELS", "400,300,200,100,50,25,10"
    ).split(",")
]
# (mode, freeze_encoder, unfreeze_last_layers, learning_rate)
TRAIN_MODES: list[tuple[str, bool, int | None, float]] = [
    ("frozen", True, None, 3e-4),
    ("unfreeze1", False, 1, 1e-4),
    ("unfreeze2", False, 2, 5e-5),
    ("full", False, None, 5e-5),
]

STAGE_INPUT = {
    "frozen": lambda frac_name, labels: Path(
        f"outputs/pretrain/{frac_name}/checkpoints/best.ckpt"
    ),
    "unfreeze1": lambda frac_name, labels: Path(
        f"outputs/train/{frac_name}_{labels}_frozen/checkpoints/best.ckpt"
    ),
    "unfreeze2": lambda frac_name, labels: Path(
        f"outputs/train/{frac_name}_{labels}_unfreeze1/checkpoints/best.ckpt"
    ),
    "full": lambda frac_name, labels: Path(
        f"outputs/train/{frac_name}_{labels}_unfreeze2/checkpoints/best.ckpt"
    ),
}


def run(cmd: list[str]) -> None:
    print("\n🚀 Running:", " ".join(cmd))
    subprocess.run(cmd, check=True)


def main() -> None:
    print("===============================================")
    print("🔥 MAE Downstream Ablation Runner")
    print("===============================================")

    for frac, frac_name in PRETRAIN_FRACTIONS.items():
        print(f"\n\n=============================")
        print(f"📦 PRETRAIN FRACTION = {frac}%")
        print("=============================\n")

        for labels in LABELS_PER_CLASS:
            print(f"\n----- 🎯 LABELS PER CLASS = {labels} -----")

            for mode_name, freeze_flag, unfreeze_layers, lr in TRAIN_MODES:
                ckpt = STAGE_INPUT[mode_name](frac_name, labels)
                if not ckpt.exists():
                    print(f"❌ ERROR: Missing checkpoint at: {ckpt}")
                    continue

                suffix = f"{frac_name}_{labels}_{mode_name}"
                best = Path("outputs/train") / suffix / "checkpoints" / "best.ckpt"
                if best.exists():
                    print(f"⏩ SKIPPING {suffix} (already done)")
                    continue

                # fresh deep config per run (the reference's shallow base_cfg
                # .copy() leaks nested mutations across iterations — quirk Q9)
                cfg: dict = yaml.safe_load(BASE_CONFIG.read_text())
                cfg["train"]["samples_per_class"] = labels
                cfg["train"]["freeze_encoder"] = freeze_flag
                cfg["train"]["learning_rate"] = lr
                if not freeze_flag and unfreeze_layers is not None and mode_name != "full":
                    cfg["train"]["unfreeze_last_layers"] = unfreeze_layers
                else:
                    cfg["train"].pop("unfreeze_last_layers", None)

                tmp_cfg = Path(f"configs/tmp_{suffix}.yaml")
                with open(tmp_cfg, "w") as f:
                    yaml.safe_dump(cfg, f)
                print(f"\n📝 Created config {tmp_cfg}")

                ckpt_arg = (
                    "--encoder_ckpt" if mode_name == "frozen" else "--classifier_ckpt"
                )
                cmd = [
                    sys.executable, "-m", "scripts.training.train_mae",
                    "--config", str(tmp_cfg),
                    ckpt_arg, str(ckpt),
                    "--output_dir_suffix", suffix,
                ]
                try:
                    run(cmd)
                except subprocess.CalledProcessError:
                    print(f"❌ ERROR during training: {suffix}")
                    continue
                time.sleep(1)
                tmp_cfg.unlink(missing_ok=True)

    print("\n\n===============================================")
    print("🎉 ALL DOWNSTREAM ABLATIONS COMPLETED!")
    print("===============================================")


if __name__ == "__main__":
    main()
