"""Convert native JAX checkpoints → reference-style torch ``.pt`` files.

The inverse of ``convert_torch_checkpoint``: takes any native checkpoint
(trainer ``.ckpt`` or extracted weights ``.pt``) and writes a genuine
``torch.save`` state dict using the reference's parameter names, so the
artifact is a drop-in for the reference's own terminal output
(``torch.save(module.model.state_dict(), "vit-mae.pt")`` — reference
``scripts/training/pretrain_mae.py:133-134`` / ``train_mae.py:222-223``)
and loads in a plain-torch stack.

Kinds (auto-detected from the param tree, overridable with ``--kind``):
  * ``mae``        → ``encoder.vit.*`` + ``encoder.mask_token`` + ``decoder.*``
  * ``classifier`` → ``encoder.*`` + ``head.classification.{weight,bias}``
  * ``encoder``    → bare timm ViT names (``cls_token``, ``blocks.{i}.*``, …)
"""

from __future__ import annotations

import argparse
from pathlib import Path


def detect_kind(params: dict) -> str:
    if "decoder" in params:
        return "mae"
    if "head" in params:
        return "classifier"
    return "encoder"


def convert(ckpt_path: Path, out_path: Path, kind: str = "auto") -> str:
    from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import (
        is_native_checkpoint,
        load_checkpoint,
    )

    if not is_native_checkpoint(ckpt_path):
        raise ValueError(
            f"{ckpt_path} is not a native checkpoint — torch files need no "
            "conversion (use convert_torch_checkpoint for the other direction)"
        )
    state, _meta = load_checkpoint(ckpt_path)
    params = state.get("params", state)
    if kind == "auto":
        kind = detect_kind(params)

    if kind == "mae":
        torch_state = ti.mae_params_to_state(params)
    elif kind == "classifier":
        torch_state = ti.classifier_params_to_state(params)
    elif kind == "encoder":
        enc = params.get("encoder", params)
        torch_state = ti.vit_params_to_timm_state(enc)
    else:
        raise ValueError(f"unknown kind: {kind}")

    out_path.parent.mkdir(parents=True, exist_ok=True)
    ti.save_torch_state_dict(torch_state, out_path)
    return kind


def main() -> None:
    parser = argparse.ArgumentParser(description="JAX → torch checkpoint converter")
    parser.add_argument("input", help="native checkpoint (.ckpt/.pt)")
    parser.add_argument("output", help="torch .pt output path")
    parser.add_argument("--kind", default="auto",
                        choices=["auto", "mae", "classifier", "encoder"])
    args = parser.parse_args()

    kind = convert(Path(args.input), Path(args.output), args.kind)
    print(f"🔎 Checkpoint kind: {kind}")
    print(f"✅ Wrote torch state dict: {args.output}")


if __name__ == "__main__":
    main()
