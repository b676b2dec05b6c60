"""Per-op device-time breakdown from a jax.profiler xplane trace.

Aggregates TPU device-plane op events by (fused) op name and prints the
top-K by total device time, plus the plane/line totals — the lens used to
attribute step-time deltas between tasks (e.g. the round-5 JEPA-vs-MAE
gap). Works on the traces `bench.py --profile-dir` captures.

Usage: python tools/trace_ops.py <profile_dir> [top_k] [--steps N]
(--steps divides totals into per-step ms).
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import defaultdict


def op_table(profile_dir: str):
    from jax.profiler import ProfileData

    files = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"),
                  recursive=True)
    )
    per_line = defaultdict(float)   # (plane, line) -> total ns
    per_op = defaultdict(float)     # normalized op name -> total ns
    for f in files:
        data = ProfileData.from_file(f)
        for plane in data.planes:
            if "/device:TPU" not in plane.name:
                continue
            for line in plane.lines:
                for ev in line.events:
                    per_line[(plane.name, line.name)] += ev.duration_ns
                    if line.name in ("XLA Ops", "XLA TraceMe"):
                        # '%Block.37 = (bf16[111360,192]...' -> 'Block.37'
                        # (individual), and 'Block' (class aggregate)
                        head = ev.name.split(" = ", 1)[0].lstrip("%")
                        per_op[f"{line.name}:{head}"] += ev.duration_ns
                        base = re.sub(r"[.\d-]+$", "", head)
                        per_op[f"{line.name}:{base}.*"] += ev.duration_ns
    return per_line, per_op


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    profile_dir = args[0]
    top_k = int(args[1]) if len(args) > 1 else 30
    steps = None
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            steps = int(a.split("=", 1)[1] if "=" in a
                        else sys.argv[sys.argv.index(a) + 1])
    per_line, per_op = op_table(profile_dir)
    div = steps or 1
    unit = "ms/step" if steps else "ms total"
    print("== plane/line totals ==")
    for (plane, line), ns in sorted(per_line.items(), key=lambda kv: -kv[1]):
        print(f"{ns / 1e6 / div:10.3f} {unit}  {plane} :: {line}")
    print(f"\n== top {top_k} ops ==")
    for name, ns in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"{ns / 1e6 / div:10.3f} {unit}  {name}")


if __name__ == "__main__":
    main()
