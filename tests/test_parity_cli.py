"""End-to-end parity_check CLI test against a synthetic timm checkpoint."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parents[1]


def test_parity_cli_passes(tmp_path):
    sys.path.insert(0, str(REPO))
    from tests.test_interop import make_timm_state  # synthetic timm state dict

    # parity_check reads geometry from the config; build a matching tiny one
    from tests.test_interop import D, DEPTH, HEADS, IMG, P

    cfg = {
        "model": {
            "general": {"image_size": IMG, "patch_size": P, "in_chans": 3},
            "encoder": {"embed_dim": D, "depth": DEPTH, "num_heads": HEADS},
            "decoder": {"decoder_embed_dim": 40, "decoder_depth": 1,
                        "decoder_num_heads": 4},
            "head": {"pool": "cls"},
        },
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    state = {"model.encoder.vit." + k: torch.from_numpy(v)
             for k, v in make_timm_state(11).items()}
    ckpt = tmp_path / "enc.pt"
    torch.save(state, ckpt)

    from tests.conftest import scrubbed_cpu_env

    env = scrubbed_cpu_env()
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.evaluation.parity_check", str(ckpt),
         "--config", str(cfg_path), "--batch", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY OK" in proc.stdout


def test_parity_cli_checks_mae_decoder(tmp_path):
    """A full MAE checkpoint (encoder.vit.* + decoder.*) triggers the
    decoder-pipeline golden check and passes on faithful weights."""
    sys.path.insert(0, str(REPO))
    from tests.test_interop import D, DEPTH, HEADS, IMG, P, make_mae_state

    cfg = {
        "model": {
            "general": {"image_size": IMG, "patch_size": P, "in_chans": 3},
            "encoder": {"embed_dim": D, "depth": DEPTH, "num_heads": HEADS},
            "decoder": {"decoder_embed_dim": 40, "decoder_depth": 1,
                        "decoder_num_heads": 4},
            "head": {"pool": "cls"},
        },
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    state = {k: torch.from_numpy(v) for k, v in make_mae_state(17).items()}
    ckpt = tmp_path / "vit-mae.pt"
    torch.save(state, ckpt)

    from tests.conftest import scrubbed_cpu_env

    env = scrubbed_cpu_env()
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.evaluation.parity_check", str(ckpt),
         "--config", str(cfg_path), "--batch", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MAE decoder pred" in proc.stdout, proc.stdout
    assert "PARITY OK" in proc.stdout


def test_parity_protocol_end_to_end(tmp_path):
    """The packaged one-command protocol: convert → golden-check → probe
    re-evaluation → Δ vs the 0.5-pt bar, on synthetic stand-ins (an MAE
    vit-mae.pt + a classifier .pt + a synthetic STL-10 test split). This is
    the BASELINE measurement pipeline, runnable today; the real weights slot
    in via download_weights.sh when egress exists."""
    sys.path.insert(0, str(REPO))
    from tests.test_interop import (
        D, DEPTH, HEADS, P, make_mae_state, make_timm_state,
    )
    from ssrl_vit_mae_jepa_tpu.data.stl10 import write_synthetic_stl10

    IMG96 = 96  # STL-10 binary data is always 96×96
    data = tmp_path / "data"
    write_synthetic_stl10(data, num_train=20, num_test=30, num_unlabeled=20,
                          seed=3)
    cfg = {
        "model": {
            "general": {"image_size": IMG96, "patch_size": P, "in_chans": 3},
            "encoder": {"embed_dim": D, "depth": DEPTH, "num_heads": HEADS},
            "decoder": {"decoder_embed_dim": 40, "decoder_depth": 1,
                        "decoder_num_heads": 4},
            "head": {"pool": "cls"},
        },
        "train": {"samples_per_class": 2, "total_epochs": 1,
                  "warmup_epochs": 1, "batch_size": 16, "learning_rate": 1e-3,
                  "weight_decay": 0.05, "freeze_encoder": True},
        "test": {"batch_size": 16},
        "logging": {"output_dir_base": str(tmp_path / "outputs"),
                    "model_path": "vit-mae.pt"},
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    weights = tmp_path / "weights"
    weights.mkdir()
    torch.save(
        {k: torch.from_numpy(v) for k, v in make_mae_state(31, img=IMG96).items()},
        weights / "vit-mae.pt")
    clf = {"encoder." + k: v for k, v in make_timm_state(32, img=IMG96).items()}
    r = np.random.default_rng(33)
    clf["head.classification.weight"] = r.normal(0, 0.05, (10, D)).astype(
        np.float32)
    clf["head.classification.bias"] = np.zeros(10, np.float32)
    torch.save({k: torch.from_numpy(v) for k, v in clf.items()},
               weights / "mae_100_400.pt")

    from tests.conftest import scrubbed_cpu_env

    env = scrubbed_cpu_env(SSRL_DATA_DIR=str(data))
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.evaluation.run_parity_protocol",
         str(weights), "--config", str(cfg_path), "--batch", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = proc.stdout
    assert "MAE decoder pred" in out, out          # decoder golden ran
    assert "probe top-1" in out, out               # probe re-evaluation ran
    assert "Δ 0.000 pts" in out, out               # exact agreement expected
    assert "PROTOCOL OK" in out, out
