"""End-to-end CLI tests: pretrain → fine-tune (encoder_ckpt) → evaluate.

Runs the actual ``python -m scripts.*`` entry points in subprocesses against
a synthetic STL-10 dataset — the same chaining the ablation drivers use.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]


def run_cli(module, *argv, env_extra=None, timeout=600):
    from tests.conftest import scrubbed_cpu_env

    env = scrubbed_cpu_env(**(env_extra or {}))
    proc = subprocess.run(
        [sys.executable, "-m", module, *argv],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"{module} failed\nSTDOUT:\n{proc.stdout[-4000:]}\n"
            f"STDERR:\n{proc.stderr[-4000:]}"
        )
    return proc.stdout


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    from ssrl_vit_mae_jepa_tpu.data.stl10 import write_synthetic_stl10

    root = tmp_path_factory.mktemp("cli")
    data = root / "data"
    write_synthetic_stl10(data, num_train=60, num_test=40, num_unlabeled=120, seed=1)
    cfg = {
        "model": {
            "general": {"image_size": 96, "patch_size": 8, "in_chans": 3},
            "encoder": {"embed_dim": 32, "depth": 2, "num_heads": 4},
            "decoder": {
                "decoder_embed_dim": 32, "decoder_depth": 1, "decoder_num_heads": 4
            },
            "head": {"embed_dim": 32, "pool": "cls"},
        },
        "pretrain": {
            "mask_ratio_start": 0.75, "mask_ratio_end": 0.75,
            "mask_ramp_epochs": 5, "total_epochs": 2, "warmup_epochs": 1,
            "batch_size": 16, "base_learning_rate": 1.5e-4,
            "weight_decay": 0.05, "data_fraction": 1.0, "val_split": 0.1,
        },
        "train": {
            "samples_per_class": 4, "total_epochs": 2, "warmup_epochs": 1,
            "batch_size": 16, "learning_rate": 1e-3, "weight_decay": 0.05,
            "freeze_encoder": True,
        },
        "test": {"batch_size": 16},
        "logging": {
            "output_dir_base": str(root / "outputs"), "model_path": "vit-mae.pt"
        },
    }
    cfg_path = root / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return {
        "root": root,
        "cfg_path": cfg_path,
        "outputs": root / "outputs",
        "env": {"SSRL_DATA_DIR": str(data)},
    }


@pytest.mark.slow
class TestEndToEnd:
    def test_full_chain(self, cli_env):
        env = cli_env["env"]
        cfg = str(cli_env["cfg_path"])
        out = cli_env["outputs"]

        # 1) MAE pretraining
        stdout = run_cli(
            "scripts.training.pretrain_mae",
            "--config", cfg, "--output_dir_suffix", "mae_t",
            env_extra=env,
        )
        assert "Pretraining complete" in stdout
        pre_dir = out / "pretrain" / "mae_t"
        best = pre_dir / "checkpoints" / "best.ckpt"
        assert best.exists()
        assert (pre_dir / "checkpoints" / "last.ckpt").exists()
        assert (pre_dir / "config.yaml").exists()
        assert (pre_dir / "vit-mae.pt").exists()
        # the terminal artifact is the reference's torch-readable state dict
        import torch

        exported = torch.load(pre_dir / "vit-mae.pt", map_location="cpu",
                              weights_only=True)
        assert "encoder.vit.cls_token" in exported
        assert any(k.startswith("decoder.decoder_blocks.") for k in exported)
        metrics = [
            json.loads(line)
            for line in (pre_dir / "metrics.jsonl").read_text().splitlines()
        ]
        assert any("val_loss" in m for m in metrics)
        assert any("mask_ratio" in m for m in metrics)

        # 2) resume continues from the saved epoch
        stdout = run_cli(
            "scripts.training.pretrain_mae",
            "--config", cfg, "--output_dir_suffix", "mae_t",
            "--resume_from", str(pre_dir / "checkpoints" / "last.ckpt"),
            env_extra=env,
        )
        assert "Resumed" in stdout

        # 3) supervised probe from the pretrain checkpoint (encoder prefix path)
        stdout = run_cli(
            "scripts.training.train_mae",
            "--config", cfg, "--encoder_ckpt", str(best),
            "--output_dir_suffix", "mae_t_400_frozen",
            env_extra=env,
        )
        assert "Training complete" in stdout
        assert "Freezing encoder" in stdout
        train_best = out / "train/mae_t_400_frozen/checkpoints/best.ckpt"
        assert train_best.exists()

        # 4) continuation from classifier ckpt (ablation chaining path)
        stdout = run_cli(
            "scripts.training.train_mae",
            "--config", cfg, "--classifier_ckpt", str(train_best),
            "--output_dir_suffix", "mae_t_400_full",
            env_extra=env,
        )
        assert "full classifier checkpoint" in stdout

        # 5) also load the exported raw weights file (.pt path of the loader)
        stdout = run_cli(
            "scripts.training.train_mae",
            "--config", cfg,
            "--encoder_ckpt", str(pre_dir / "vit-mae.pt"),
            "--output_dir_suffix", "mae_t_400_pt",
            env_extra=env,
        )
        assert "Training complete" in stdout

        # 6) evaluation
        stdout = run_cli(
            "scripts.evaluation.evaluate_classifier",
            "--config", cfg, "--checkpoint", str(train_best),
            env_extra=env,
        )
        assert "Test Accuracy" in stdout

    def test_jepa_pretrain_and_probe(self, cli_env):
        """JEPA CLI → downstream probe via --encoder_ckpt (BASELINE config 4)."""
        import yaml as _yaml

        cfg = _yaml.safe_load(cli_env["cfg_path"].read_text())
        cfg["jepa"] = {
            "total_epochs": 2, "warmup_epochs": 1, "batch_size": 16,
            "base_learning_rate": 1.5e-4, "weight_decay": 0.05,
            "data_fraction": 1.0, "val_split": 0.1,
            "predictor_embed_dim": 32, "predictor_depth": 1,
            "predictor_num_heads": 4, "num_target_blocks": 4,
            "ema_start": 0.99, "ema_end": 1.0,
        }
        jepa_cfg_path = cli_env["root"] / "tiny_jepa.yaml"
        jepa_cfg_path.write_text(_yaml.safe_dump(cfg))
        stdout = run_cli(
            "scripts.training.pretrain_jepa",
            "--config", str(jepa_cfg_path), "--output_dir_suffix", "jepa_t",
            env_extra=cli_env["env"],
        )
        assert "JEPA pretraining complete" in stdout
        best = cli_env["outputs"] / "pretrain/jepa_t/checkpoints/best.ckpt"
        assert best.exists()
        # the .pt terminal artifact must be genuinely torch-loadable (the
        # MAE torch.save contract) — it used to be a native zip with a .pt
        # suffix — and the full JEPA state rides alongside natively
        import torch

        state = torch.load(
            cli_env["outputs"] / "pretrain/jepa_t/vit-jepa.pt",
            weights_only=True,
        )
        assert "cls_token" in state and "blocks.0.attn.qkv.weight" in state
        assert (cli_env["outputs"] / "pretrain/jepa_t/jepa_state.ckpt").exists()
        stdout = run_cli(
            "scripts.training.train_mae",
            "--config", str(jepa_cfg_path), "--encoder_ckpt", str(best),
            "--output_dir_suffix", "jepa_t_400_frozen",
            env_extra=cli_env["env"],
        )
        assert "Training complete" in stdout

    def test_orbax_backend_via_config(self, cli_env):
        """`logging.ckpt_backend: orbax` routes CLI checkpoints through orbax.

        Checkpoints become orbax directories (meta.json + state/) instead of
        zip files, and `--resume_from` restores from them (the trainer
        detects the format, `trainer.py:_resume`).
        """
        import yaml as _yaml

        cfg = _yaml.safe_load(cli_env["cfg_path"].read_text())
        cfg["logging"]["ckpt_backend"] = "orbax"
        orb_cfg_path = cli_env["root"] / "tiny_orbax.yaml"
        orb_cfg_path.write_text(_yaml.safe_dump(cfg))
        stdout = run_cli(
            "scripts.training.pretrain_mae",
            "--config", str(orb_cfg_path), "--output_dir_suffix", "mae_orb",
            env_extra=cli_env["env"],
        )
        assert "Pretraining complete" in stdout
        last = cli_env["outputs"] / "pretrain/mae_orb/checkpoints/last.ckpt"
        assert last.is_dir() and (last / "meta.json").exists()
        stdout = run_cli(
            "scripts.training.pretrain_mae",
            "--config", str(orb_cfg_path), "--output_dir_suffix", "mae_orb",
            "--resume_from", str(last),
            env_extra=cli_env["env"],
        )
        assert "Resumed" in stdout

    def test_baseline_random_init(self, cli_env):
        stdout = run_cli(
            "scripts.training.train_mae",
            "--config", str(cli_env["cfg_path"]),
            "--output_dir_suffix", "mae_000_4",
            env_extra=cli_env["env"],
        )
        assert "Baseline: random-initialized" in stdout

    def test_synthetic_data_cli(self, tmp_path):
        run_cli(
            "scripts.data", "--synthetic", "--data_dir", str(tmp_path / "d"),
            "--synthetic_train", "20", "--synthetic_test", "10",
            "--synthetic_unlabeled", "30",
        )
        assert (tmp_path / "d/stl10_binary/unlabeled_X.bin").exists()
