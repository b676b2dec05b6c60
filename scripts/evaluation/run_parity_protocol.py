"""One-command checkpoint-parity protocol (the BASELINE.md fidelity claim).

BASELINE.md's accuracy target — STL-10 linear-probe top-1 within 0.5 points —
is defined against *converted and re-evaluated reference checkpoints*
(reference ``download_weights.sh:1-8`` fetches them; no numeric baseline is
published anywhere in the reference repo, SURVEY.md §6). This driver is that
measurement, end to end, in one command:

1. **Convert**: every ``*.pt``/``*.ckpt`` under the weights path goes through
   the torch→JAX converter (``utils.torch_interop``).
2. **Golden-check**: numerics are verified against an independent torch
   forward (encoder features, full MAE pred+target pipeline incl. the
   decoder, classifier logits) via ``parity_check.check_file``.
3. **Probe re-evaluation**: classifier weights are evaluated on the STL-10
   test split twice — through OUR stack (``evaluate_checkpoint``) and through
   the independent torch golden on the *same eval-transformed batches* — and
   the top-1 delta is reported against the 0.5-pt bar.

Zero egress blocks fetching the real release artifacts from this dev
environment; the protocol is exercised in CI with synthetic stand-ins
(tests/test_parity_cli.py) and runs unchanged on the real weights:

    ./download_weights.sh
    python -m scripts.evaluation.run_parity_protocol assets/weights \
        --config configs/mae.yaml --data-dir data
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)


def _torch_probe_top1(golden_features, labels, weights, pool, head_w, head_b):
    """Top-1 of the torch-golden classifier on pre-computed golden features."""
    if pool == "mean":
        pooled = golden_features.mean(axis=1)  # mean INCLUDES CLS (quirk Q6)
    else:
        pooled = golden_features[:, 0]
    logits = pooled @ head_w.T + head_b
    correct = (logits.argmax(1) == labels).astype(np.float64) * weights
    return correct.sum(), weights.sum()


def evaluate_probe_delta(ckpt: Path, cfg: dict, data_dir) -> tuple:
    """(ours_top1, torch_top1) on the SAME eval-transformed test batches."""
    import jax.numpy as jnp

    from scripts.evaluation.parity_check import torch_forward_features
    from scripts.utils import evaluate_checkpoint
    from ssrl_vit_mae_jepa_tpu.data.loaders import get_test_dataloader
    from ssrl_vit_mae_jepa_tpu.ops.augment import eval_transform
    from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti

    loader = get_test_dataloader(cfg, data_dir)
    ours = float(evaluate_checkpoint(cfg, ckpt, loader))

    model_cfg = cfg["model"]
    depth = model_cfg["encoder"]["depth"]
    heads = model_cfg["encoder"]["num_heads"]
    p = model_cfg["general"]["patch_size"]
    pool = model_cfg.get("head", {}).get("pool", "cls")

    flat = ti.load_torch_state_dict(ckpt)
    prefix = ti.detect_prefix(flat) or ""
    enc_state = ti.strip_prefix(flat, prefix) if prefix else dict(flat)
    if ti.detect_prefix(enc_state, ["vit."]):
        enc_state = {k[len("vit."):]: v for k, v in enc_state.items()
                     if k.startswith("vit.")}
    head_w = np.asarray(
        flat[[k for k in flat if k.endswith("head.classification.weight")][0]],
        np.float32)
    head_b = np.asarray(
        flat[[k for k in flat if k.endswith("head.classification.bias")][0]],
        np.float32)

    c_sum = 0.0
    w_sum = 0.0
    for batch in loader.epoch(0):
        imgs = np.asarray(
            eval_transform(
                jnp.asarray(batch["image"]),
                out_size=model_cfg["general"]["image_size"],
                dtype=jnp.float32,
            )
        ).transpose(0, 3, 1, 2)
        feats = torch_forward_features(enc_state, imgs, depth, heads, p)
        c, w = _torch_probe_top1(
            feats, batch["label"], batch["weight"].astype(np.float64),
            pool, head_w, head_b,
        )
        c_sum += c
        w_sum += w
    return ours, c_sum / max(w_sum, 1e-9)


def main():
    parser = argparse.ArgumentParser(
        description="Convert → golden-check → probe-re-evaluate reference "
        "checkpoints against the BASELINE 0.5-pt parity bar")
    parser.add_argument(
        "weights", type=str,
        help="a .pt/.ckpt file or a directory of them (assets/weights)")
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument("--data-dir", type=str, default=None,
                        help="dir containing stl10_binary/ (default: ./data "
                        "or $SSRL_DATA_DIR)")
    parser.add_argument("--batch", type=int, default=8,
                        help="batch for the golden numeric checks")
    parser.add_argument("--tol", type=float, default=1e-3,
                        help="max-abs fp32 tolerance for golden checks")
    parser.add_argument("--bar", type=float, default=0.5,
                        help="probe top-1 parity bar in percentage points")
    args = parser.parse_args()

    from scripts.evaluation.parity_check import check_file
    from ssrl_vit_mae_jepa_tpu.config import load_config
    from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti

    cfg = load_config(args.config)
    root = Path(args.weights)
    files = sorted(
        [root] if root.is_file()
        else [p for p in root.iterdir() if p.suffix in (".pt", ".ckpt")]
    )
    if not files:
        raise SystemExit(f"❌ no .pt/.ckpt files under {root}")

    all_ok = True
    rows = []
    for f in files:
        print(f"\n━━ {f.name} ━━")
        try:
            ok = check_file(f, cfg, batch=args.batch, tol=args.tol)
        except SystemExit as e:
            print(e)
            ok = False
        row = {"file": f.name, "golden": ok}
        flat = ti.load_torch_state_dict(f)
        if ok and any("head.classification" in k for k in flat):
            ours, golden_acc = evaluate_probe_delta(f, cfg, args.data_dir)
            delta_pts = abs(ours - golden_acc) * 100.0
            row.update(ours_top1=ours, torch_top1=golden_acc,
                       delta_pts=delta_pts, within_bar=delta_pts <= args.bar)
            print(f"🎯 probe top-1: ours {ours:.4f} vs torch-golden "
                  f"{golden_acc:.4f} → Δ {delta_pts:.3f} pts "
                  f"(bar {args.bar}) "
                  f"{'✅' if row['within_bar'] else '❌'}")
            ok = ok and row["within_bar"]
        rows.append(row)
        all_ok = all_ok and ok

    print("\n━━ parity protocol summary ━━")
    for r in rows:
        bits = [f"golden={'OK' if r['golden'] else 'FAIL'}"]
        if "delta_pts" in r:
            bits.append(f"Δtop1={r['delta_pts']:.3f}pts "
                        f"{'OK' if r['within_bar'] else 'FAIL'}")
        print(f"  {r['file']}: " + ", ".join(bits))
    print("✅ PROTOCOL OK" if all_ok else "❌ PROTOCOL FAILED")
    raise SystemExit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
