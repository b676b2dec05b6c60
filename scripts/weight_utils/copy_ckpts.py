"""Harvest best checkpoints from the ablation sweep into assets/weights/.

Reference contract (``scripts/weight_utils/copy_ckpts.py:34-56``): copy each
``outputs/train/mae_<pct>_<labels>_full/checkpoints/best.ckpt`` to
``assets/weights/mae_<pct>_<labels>.ckpt``.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

FRACTIONS = ["000", "025", "050", "075", "100"]
LABELS = [10, 25, 50, 100, 200, 300, 400]


def main():
    parser = argparse.ArgumentParser(description="Harvest ablation best checkpoints")
    parser.add_argument("--outputs_dir", type=str, default="outputs/train")
    parser.add_argument("--dest_dir", type=str, default="assets/weights")
    parser.add_argument("--mode", type=str, default="full")
    args = parser.parse_args()

    dest = Path(args.dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    copied = 0
    for frac in FRACTIONS:
        for labels in LABELS:
            src = (
                Path(args.outputs_dir)
                / f"mae_{frac}_{labels}_{args.mode}"
                / "checkpoints"
                / "best.ckpt"
            )
            if not src.exists():
                continue
            dst = dest / f"mae_{frac}_{labels}.ckpt"
            shutil.copy2(src, dst)
            copied += 1
            print(f"📦 {src} → {dst}")
    print(f"✅ Copied {copied} checkpoints to {dest}")


if __name__ == "__main__":
    main()
