"""MAE reconstruction visualizer.

Reference contract (``scripts/evaluation/visualize_reconstruction.py``):
load an MAE checkpoint, run a fixed-seed random mask over a batch of labeled
training images, and save a 3-row figure (original / masked-with-gray-fill /
full reconstruction where kept patches come from the input and masked
patches from the decoder), printing MSE / MAE / PSNR over masked patches
(reference ``:324-334``). The fixed mask uses seed 42 (reference ``:150``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)

MASK_SEED = 42


def reconstruct_batch(cfg, checkpoint, images_u8, mask_ratio=0.75):
    """→ dict with originals / masked / reconstructed images in [0,1] + metrics."""
    import jax
    import jax.numpy as jnp

    from ssrl_vit_mae_jepa_tpu.models import mae_from_config
    from ssrl_vit_mae_jepa_tpu.ops.augment import eval_transform
    from ssrl_vit_mae_jepa_tpu.ops.masking import (
        get_at_index,
        num_masked_tokens,
        random_token_mask,
        set_at_index,
    )
    from ssrl_vit_mae_jepa_tpu.ops.patches import patchify, unpatchify
    from ssrl_vit_mae_jepa_tpu.utils.load import mae_params_from_checkpoint

    model_cfg = cfg["model"]
    mae = mae_from_config(model_cfg, dtype=jnp.float32)
    depth = model_cfg["encoder"]["depth"]
    dec_depth = model_cfg["decoder"]["decoder_depth"]
    params, report = mae_params_from_checkpoint(checkpoint, depth, dec_depth)
    if report["missing"]:
        print(f"⚠️ Missing keys: {report['missing'][:5]} ...")

    images = eval_transform(jnp.asarray(images_u8))  # [-1, 1]
    B, L = images.shape[0], mae.sequence_length
    p = mae.patch_size
    n_mask = num_masked_tokens(L, mask_ratio)
    idx_keep, idx_mask = random_token_mask(
        jax.random.PRNGKey(MASK_SEED), B, L, n_mask
    )
    # jit: eager ops cost ~0.5 s each over the axon tunnel (CLAUDE.md)
    pred, target = jax.jit(mae.apply)({"params": params}, images, idx_keep, idx_mask)

    patches = patchify(images, p)  # (B, N, p²·3)
    # masked image: gray (0.5 in [0,1] = 0.0 in [-1,1]) at masked patches
    gray = jnp.zeros_like(patches)
    masked_patches = set_at_index(
        patches, jnp.clip(idx_mask - 1, 0, None), get_at_index(gray, jnp.clip(idx_mask - 1, 0, None))
    )
    # full reconstruction: kept pixels from input, masked from prediction
    recon_patches = set_at_index(
        patches, jnp.clip(idx_mask - 1, 0, None), pred.astype(patches.dtype)
    )

    to01 = lambda x: np.clip((np.asarray(x) + 1.0) / 2.0, 0, 1)  # noqa: E731
    pred_f = np.asarray(pred, np.float32)
    tgt_f = np.asarray(target, np.float32)
    mse = float(np.mean((pred_f - tgt_f) ** 2))
    mae_err = float(np.mean(np.abs(pred_f - tgt_f)))
    # PSNR over [0,1]-scaled pixels (data range 2.0 in [-1,1] space)
    psnr = 10.0 * np.log10(4.0 / max(mse, 1e-12))
    return {
        "original": to01(images),
        "masked": to01(unpatchify(masked_patches, p)),
        "reconstructed": to01(unpatchify(recon_patches, p)),
        "mse": mse,
        "mae": mae_err,
        "psnr": psnr,
    }


def main():
    parser = argparse.ArgumentParser(description="Visualize MAE reconstructions")
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--num_images", type=int, default=8)
    parser.add_argument("--mask_ratio", type=float, default=0.75)
    parser.add_argument(
        "--output", type=str, default="assets/visualizations/reconstruction_validation.png"
    )
    args = parser.parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config
    from ssrl_vit_mae_jepa_tpu.data.loaders import DATA_DIR
    from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10

    cfg = load_config(args.config)
    ds = STL10(DATA_DIR, "train")
    images_u8 = ds.images_nhwc(np.arange(args.num_images))
    out = reconstruct_batch(cfg, args.checkpoint, images_u8, args.mask_ratio)

    print(f"📊 Masked-patch metrics: MSE={out['mse']:.4f} "
          f"MAE={out['mae']:.4f} PSNR={out['psnr']:.2f} dB")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("⚠️ matplotlib unavailable — skipping figure")
        return

    n = args.num_images
    fig, axes = plt.subplots(3, n, figsize=(2 * n, 6))
    rows = [("Original", out["original"]), ("Masked", out["masked"]),
            ("Reconstructed", out["reconstructed"])]
    for r, (title, imgs) in enumerate(rows):
        for c in range(n):
            ax = axes[r, c] if n > 1 else axes[r]
            ax.imshow(imgs[c])
            ax.axis("off")
            if c == 0:
                ax.set_ylabel(title)
        (axes[r, 0] if n > 1 else axes[r]).set_title(title, loc="left")
    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"🖼️ Saved figure to {out_path}")


if __name__ == "__main__":
    main()
