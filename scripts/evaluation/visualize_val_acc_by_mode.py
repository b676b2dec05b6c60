"""Validation-accuracy-by-finetune-mode plot.

Reference contract (``scripts/evaluation/visualize_val_acc_by_mode.py``):
read ``best_model_score`` out of each ablation run's best checkpoint
(reference pulls it from the Lightning ``callbacks`` dict, ``:17-38``; our
native checkpoints store it in ``meta["callbacks"]["best_model_score"]``),
parse the ``mae_<pct>_<labels>_<mode>`` directory names, and plot mean val
accuracy per fine-tuning mode → ``val_accuracy_by_mode.png``.
"""

from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict
from pathlib import Path

NAME_RE = re.compile(r"mae_(\d{3})_(\d+)_(frozen|unfreeze1|unfreeze2|full)$")
MODE_ORDER = ["frozen", "unfreeze1", "unfreeze2", "full"]


def best_score_from_checkpoint(path: Path):
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import (
        is_native_checkpoint,
        load_checkpoint,
    )

    if is_native_checkpoint(path):
        _, meta = load_checkpoint(path)
        return meta.get("callbacks", {}).get("best_model_score")
    try:  # reference Lightning checkpoint
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        for cb in ckpt.get("callbacks", {}).values():
            if isinstance(cb, dict) and "best_model_score" in cb:
                score = cb["best_model_score"]
                return float(score) if score is not None else None
    except Exception:
        pass
    return None


def main():
    parser = argparse.ArgumentParser(description="Plot val accuracy by finetune mode")
    parser.add_argument("--outputs_dir", type=str, default="outputs/train")
    parser.add_argument(
        "--output", type=str, default="assets/visualizations/val_accuracy_by_mode.png"
    )
    args = parser.parse_args()

    by_mode = defaultdict(list)
    records = []
    for run_dir in sorted(Path(args.outputs_dir).iterdir()):
        m = NAME_RE.match(run_dir.name)
        if not m:
            continue
        best = run_dir / "checkpoints" / "best.ckpt"
        if not best.exists():
            continue
        score = best_score_from_checkpoint(best)
        if score is None:
            continue
        frac, labels, mode = m.group(1), int(m.group(2)), m.group(3)
        by_mode[mode].append(score)
        records.append({"fraction": frac, "labels": labels, "mode": mode,
                        "best_val_acc": score})
        print(f"📈 {run_dir.name}: best val_acc={score:.4f}")

    if not records:
        print(f"No completed runs found under {args.outputs_dir}")
        return

    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.with_suffix(".json").write_text(json.dumps(records, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np
    except ImportError:
        print("⚠️ matplotlib unavailable — wrote JSON only")
        return

    modes = [m for m in MODE_ORDER if m in by_mode]
    means = [float(np.mean(by_mode[m])) for m in modes]
    stds = [float(np.std(by_mode[m])) for m in modes]
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.bar(modes, means, yerr=stds, capsize=4, color="tab:blue", alpha=0.8)
    ax.set_ylabel("mean best val accuracy")
    ax.set_title("Validation accuracy by fine-tuning mode")
    ax.grid(axis="y", alpha=0.3)
    fig.savefig(out_path, dpi=120)
    print(f"🖼️ Saved plot to {out_path}")


if __name__ == "__main__":
    main()
