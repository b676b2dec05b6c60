"""Ablation-driver end-to-end smoke: the full sweep machinery on a tiny grid.

Covers BASELINE config 5: run_pretrain_ablation → run_train_ablation (all
four chained modes) → run_baseline_ablation → checkpoint harvest → sweep
analysis, in a temp working directory against synthetic STL-10.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]


def run_driver(module, cwd, env_extra, timeout=900):
    from tests.conftest import scrubbed_cpu_env

    env = scrubbed_cpu_env(PYTHONPATH=str(REPO), **env_extra)
    proc = subprocess.run(
        [sys.executable, "-m", module],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"{module} failed\nSTDOUT:\n{proc.stdout[-3000:]}\n"
            f"STDERR:\n{proc.stderr[-3000:]}"
        )
    return proc.stdout


@pytest.mark.slow
def test_full_sweep_chain(tmp_path):
    from ssrl_vit_mae_jepa_tpu.data.stl10 import write_synthetic_stl10

    data = tmp_path / "data"
    write_synthetic_stl10(data, num_train=60, num_test=30, num_unlabeled=80, seed=2)
    (tmp_path / "configs").mkdir()
    cfg = {
        "model": {
            "general": {"image_size": 96, "patch_size": 8, "in_chans": 3},
            "encoder": {"embed_dim": 32, "depth": 2, "num_heads": 4},
            "decoder": {"decoder_embed_dim": 32, "decoder_depth": 1,
                        "decoder_num_heads": 4},
            "head": {"embed_dim": 32, "pool": "cls"},
        },
        "pretrain": {
            "mask_ratio_start": 0.75, "mask_ratio_end": 0.75,
            "mask_ramp_epochs": 5, "total_epochs": 1, "warmup_epochs": 1,
            "batch_size": 16, "base_learning_rate": 1.5e-4,
            "weight_decay": 0.05, "data_fraction": 1.0, "val_split": 0.1,
        },
        "train": {
            "samples_per_class": 3, "total_epochs": 1, "warmup_epochs": 1,
            "batch_size": 16, "learning_rate": 1e-3, "weight_decay": 0.05,
            "freeze_encoder": False,
        },
        "test": {"batch_size": 16},
        "logging": {"output_dir_base": "outputs", "model_path": "vit-mae.pt"},
    }
    (tmp_path / "configs/mae.yaml").write_text(yaml.safe_dump(cfg))
    env = {"SSRL_DATA_DIR": str(data)}

    # 1) pretrain sweep (single fraction)
    out = run_driver(
        "scripts.ablation.run_pretrain_ablation", tmp_path,
        {**env, "SSRL_ABLATION_FRACTIONS": "1.0"},
    )
    assert "All requested pretraining experiments completed" in out
    assert (tmp_path / "outputs/pretrain/mae_100/checkpoints/best.ckpt").exists()

    # idempotent skip on rerun
    out = run_driver(
        "scripts.ablation.run_pretrain_ablation", tmp_path,
        {**env, "SSRL_ABLATION_FRACTIONS": "1.0"},
    )
    assert "skipping" in out.lower()

    # 2) downstream sweep: all four chained modes for one cell
    out = run_driver(
        "scripts.ablation.run_train_ablation", tmp_path,
        {**env, "SSRL_ABLATION_FRACTIONS": "100", "SSRL_ABLATION_LABELS": "3"},
    )
    assert "ALL DOWNSTREAM ABLATIONS COMPLETED" in out
    for mode in ("frozen", "unfreeze1", "unfreeze2", "full"):
        assert (
            tmp_path / f"outputs/train/mae_100_3_{mode}/checkpoints/best.ckpt"
        ).exists(), mode

    # 3) random-init baseline
    out = run_driver(
        "scripts.ablation.run_baseline_ablation", tmp_path,
        {**env, "SSRL_ABLATION_LABELS": "3"},
    )
    assert "Baseline ablation complete" in out
    assert (tmp_path / "outputs/train/mae_000_3/checkpoints/best.ckpt").exists()

    # 4) harvest best checkpoints into assets/weights
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.weight_utils.copy_ckpts",
         "--outputs_dir", "outputs/train", "--dest_dir", "assets/weights"],
        cwd=tmp_path,
        env=__import__("tests.conftest", fromlist=["x"]).scrubbed_cpu_env(
            PYTHONPATH=str(REPO)),
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert (tmp_path / "assets/weights/mae_100_3.ckpt").exists()

    # 5) sweep analysis reads best_model_score from every run
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.evaluation.visualize_val_acc_by_mode",
         "--outputs_dir", "outputs/train",
         "--output", "assets/visualizations/val_accuracy_by_mode.png"],
        cwd=tmp_path,
        env=__import__("tests.conftest", fromlist=["x"]).scrubbed_cpu_env(
            PYTHONPATH=str(REPO)),
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    records = json.loads(
        (tmp_path / "assets/visualizations/val_accuracy_by_mode.json").read_text()
    )
    modes = {r["mode"] for r in records}
    assert modes == {"frozen", "unfreeze1", "unfreeze2", "full"}
