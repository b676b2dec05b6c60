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

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "scripts.evaluation.parity_check", str(ckpt),
         "--config", str(cfg_path), "--batch", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY OK" in proc.stdout
