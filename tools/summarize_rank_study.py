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


def knn_rows(log_path: Path) -> tuple[dict, dict]:
    """(knn, ridge, knn_mean) accuracy-by-encoder, parsed from the study
    log's `=== kNN <name>` / `=== ridge <name>` / `=== kNN-mean <name>`
    section headers (the result line is attributed to the most recent
    header, so headers must be matched exhaustively)."""
    tables = {"kNN": {}, "ridge": {}, "kNN-mean": {}}
    name = kind = None
    for line in log_path.read_text(errors="replace").splitlines():
        m = re.match(r"=== (kNN-mean|kNN|ridge) (\w+) ", line)
        if m:
            kind, name = m.group(1), m.group(2)
        m = re.search(r"(?:kNN|ridge)\(.*\) test accuracy: ([0-9.]+)", line)
        if m and name and kind:
            tables[kind][name] = float(m.group(1))
    return tables["kNN"], tables["ridge"], tables["kNN-mean"]


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
    knn, ridge, knn_mean = knn_rows(log)
    probes = {
        name: probe_metrics(out / "outputs/train" / f"rank_probe_{name}")
        for name in ("random", "mae", "jepa")
    }
    print("| encoder | k-NN top-1 | ridge probe top-1 | adam probe best-val |")
    print("|---|---|---|---|")
    for name in ("pixels", "random", "mae", "jepa"):
        k = knn.get(name)
        r = ridge.get(name)
        p = probes.get(name, {}).get("best_val_acc")
        print(f"| {name} | {'' if k is None else f'{k:.1%}'} | "
              f"{'' if r is None else f'{r:.1%}'} | "
              f"{'' if p is None else f'{p:.1%}'} |")
    print()
    print(json.dumps({"knn": knn, "ridge": ridge, "knn_mean": knn_mean,
                      "probes": probes}))


if __name__ == "__main__":
    main()
