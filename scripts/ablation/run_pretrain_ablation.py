"""Pretraining ablation driver over unlabeled-data fractions.

Same external behavior as the reference ``scripts/ablation/
run_pretrain_ablation.py``: sweeps ``data_fraction`` ∈ {25, 50, 75, 100}%,
writes a derived config ``configs/mae_<suffix>.yaml`` per run, skips runs
whose ``best.ckpt`` already exists (idempotent resume, reference ``:57-59``),
launches ``scripts.training.pretrain_mae`` as a subprocess, and stops the
sweep on the first failure (reference ``:78-80``).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import yaml

BASE_CONFIG = Path(os.environ.get("SSRL_ABLATION_CONFIG", "configs/mae.yaml"))

# grid override for smoke tests / partial sweeps, e.g.
# SSRL_ABLATION_FRACTIONS=0.25,1.0
_fracs = [
    float(x)
    for x in os.environ.get("SSRL_ABLATION_FRACTIONS", "0.25,0.5,0.75,1.0").split(",")
]
FRACTIONS = {f"{int(round(f * 100)):03d}": f for f in _fracs}


def main():
    if not BASE_CONFIG.exists():
        raise FileNotFoundError(f"Base config not found: {BASE_CONFIG}")
    base_cfg = yaml.safe_load(BASE_CONFIG.read_text())

    for suffix, frac in FRACTIONS.items():
        print("\n" + "=" * 80)
        print(f"🚀 Starting pretrain run for {int(frac * 100)}% unlabeled data")
        print("=" * 80 + "\n")

        cfg = yaml.safe_load(BASE_CONFIG.read_text())  # deep fresh copy
        cfg["pretrain"]["data_fraction"] = float(frac)

        output_dir_suffix = f"mae_{suffix}"
        cfg_path = Path(f"configs/mae_{suffix}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        print(f"📝 Saved modified config: {cfg_path}")

        output_dir = (
            Path(base_cfg["logging"]["output_dir_base"])
            / "pretrain"
            / output_dir_suffix
        )
        if (output_dir / "checkpoints" / "best.ckpt").exists():
            print(f"⏭️ Existing checkpoint found at {output_dir}, skipping...\n")
            continue

        cmd = [
            sys.executable, "-m", "scripts.training.pretrain_mae",
            "--config", str(cfg_path),
            "--output_dir_suffix", output_dir_suffix,
        ]
        print(f"💻 Running command: {' '.join(cmd)}\n")
        result = subprocess.run(cmd)
        if result.returncode != 0:
            print(f"❌ Training for fraction {frac} failed. Stopping.")
            break
        print(f"✅ Finished pretraining for {int(frac * 100)}% unlabeled data\n")
        time.sleep(1)

    print("\n🎉 All requested pretraining experiments completed!")


if __name__ == "__main__":
    main()
