"""Strip training state from checkpoints → pure weight files.

Reference contract (``scripts/weight_utils/extract_weights.py:12-30``): for
every ``.ckpt`` in ``assets/weights/``, write a ``.pt`` containing only the
model weights — a torch-readable state dict with reference names. Native
trainer checkpoints lose optimizer/rng state and are exported through the
two-way interop (``utils/torch_interop.py``); torch checkpoints just shed
their Lightning wrapper. Falls back to a native weights file when torch is
not importable.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def extract(ckpt_path: Path, out_path: Path):
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import (
        is_native_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti

    if is_native_checkpoint(ckpt_path):
        state, meta = load_checkpoint(ckpt_path)
        params = state["params"] if "params" in state else state
        if not ti.export_reference_weights(out_path, params):
            save_checkpoint(
                out_path, {"params": params},
                {"kind": "weights",
                 "hyper_parameters": meta.get("hyper_parameters", {})},
            )
    else:
        flat = ti.load_torch_state_dict(ckpt_path)  # unwraps Lightning state_dict
        ti.save_torch_state_dict(flat, out_path)
    print(f"✅ {ckpt_path} → {out_path}")


def main():
    parser = argparse.ArgumentParser(description="Extract pure weights from checkpoints")
    parser.add_argument("--weights_dir", type=str, default="assets/weights")
    args = parser.parse_args()

    weights_dir = Path(args.weights_dir)
    ckpts = sorted(weights_dir.glob("*.ckpt"))
    if not ckpts:
        print(f"No .ckpt files found in {weights_dir}")
        return
    for ckpt in ckpts:
        extract(ckpt, ckpt.with_suffix(".pt"))


if __name__ == "__main__":
    main()
