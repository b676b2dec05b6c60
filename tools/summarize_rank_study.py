"""Summarize a rank-study run (tools/rank_study{,_cpu}.sh) into one table.

Parses the study log for the four k-NN rows and reads each probe run's
best validation accuracy + final test metric from its metrics.jsonl, then
prints a markdown table ready for docs/RESULTS.md plus one JSON line.

Usage: python tools/summarize_rank_study.py [outputs/rank_study_cpu]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path


def knn_rows(log_path: Path) -> dict:
    rows = {}
    name = None
    for line in log_path.read_text(errors="replace").splitlines():
        m = re.match(r"=== kNN (\w+) ", line)
        if m:
            name = m.group(1)
        m = re.search(r"kNN\(.*\) test accuracy: ([0-9.]+)", line)
        if m and name:
            rows[name] = float(m.group(1))
    return rows


def probe_metrics(run_dir: Path) -> dict:
    path = run_dir / "metrics.jsonl"
    if not path.exists():
        return {}
    best_val = None
    for line in path.read_text().splitlines():
        rec = json.loads(line)
        for key in ("val_accuracy", "val_acc", "val_top1"):
            if key in rec:
                v = float(rec[key])
                best_val = v if best_val is None else max(best_val, v)
    return {"best_val_acc": best_val}


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/rank_study_cpu")
    log = out / "study.log"
    knn = knn_rows(log)
    probes = {
        name: probe_metrics(out / "outputs/train" / f"rank_probe_{name}")
        for name in ("random", "mae", "jepa")
    }
    print("| encoder | k-NN top-1 | probe best-val top-1 |")
    print("|---|---|---|")
    for name in ("pixels", "random", "mae", "jepa"):
        k = knn.get(name)
        p = probes.get(name, {}).get("best_val_acc")
        print(f"| {name} | {'' if k is None else f'{k:.1%}'} | "
              f"{'' if p is None else f'{p:.1%}'} |")
    print()
    print(json.dumps({"knn": knn, "probes": probes}))


if __name__ == "__main__":
    main()
