"""Convert reference torch checkpoints (.pt/.ckpt) → native JAX checkpoints.

The fidelity bridge (BASELINE.json: "converters for the reference's
.pt/.ckpt checkpoints to verify output fidelity"): detects the checkpoint
kind (MAE / classifier / encoder-only) from its keys and writes a native
weights checkpoint loadable by every CLI in this framework.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description="torch → JAX checkpoint converter")
    parser.add_argument("input", type=str, help="torch .pt/.ckpt path")
    parser.add_argument("output", type=str, help="native .ckpt output path")
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--decoder_depth", type=int, default=2)
    args = parser.parse_args()

    from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import save_checkpoint

    flat = ti.load_torch_state_dict(args.input)
    keys = list(flat)
    if any(".decoder_blocks." in k or k.startswith(("decoder.", "model.decoder."))
           for k in keys):
        kind = "mae"
        params, report = ti.mae_state_to_params(flat, args.depth, args.decoder_depth)
    elif any("head.classification" in k for k in keys):
        kind = "classifier"
        params, report = ti.classifier_state_to_params(flat, args.depth)
    else:
        kind = "encoder"
        prefix = ti.detect_prefix(keys) or ""
        state = ti.strip_prefix(flat, prefix) if prefix else flat
        params, report = ti.timm_vit_to_params(state, args.depth)
        params = {"encoder": params}
    print(f"🔎 Detected checkpoint kind: {kind}")
    if report["missing"]:
        print(f"⚠️ Missing: {report['missing']}")
    if report["unexpected"]:
        print(f"⚠️ Unexpected (ignored): {report['unexpected'][:10]}")
    out = Path(args.output)
    save_checkpoint(out, {"params": params}, {"kind": f"{kind}_weights",
                                              "converted_from": str(args.input)})
    print(f"✅ Wrote {out}")


if __name__ == "__main__":
    main()
