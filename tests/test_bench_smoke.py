"""bench.py smoke: the driver runs this file for the official number —
an import/arg regression must not slip through. CPU, tiny shapes."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
@pytest.mark.parametrize("task", ["mae", "jepa", "classifier"])
def test_bench_runs_and_prints_json(task):
    from tests.conftest import scrubbed_cpu_env

    env = scrubbed_cpu_env()
    # --tiny: the flagship JEPA step (3 sub-models) compiles for >15 min on
    # this 1-core CPU host (measured round 3) — the smoke only guards the
    # import/arg/pipeline surface, so a small model is the right scale
    proc = subprocess.run(
        [sys.executable, "bench.py", "--task", task, "--batch-size", "16",
         "--steps", "2", "--warmup", "1", "--tiny"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in result, result
    assert result["value"] > 0
    assert result["unit"] == "images/s"
