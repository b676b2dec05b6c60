"""Embedding-space visualizer (UMAP / t-SNE projections of encoder features).

Reference contract (``scripts/evaluation/visualize_representation.py``):
load an encoder with prefix detection, extract features with pooling
``cls`` or ``mean`` — the viz mean pool EXCLUDES the CLS token (reference
``:87-96``; quirk Q6, unlike the classifier head's mean pool) —
normalization ``none``/``l2``/``channel``, project to 2-D with UMAP
(umap-learn when installed, else the built-in clean-room numpy UMAP in
``utils/umap_np.py`` — the reference default runs either way) or t-SNE,
and save a global scatter plus 10
class-vs-rest plots to ``assets/visualizations/``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)


def extract_features(cfg, checkpoint, pool="cls", normalize="none",
                     split="train", batch_size=256, data_dir=None):
    import jax.numpy as jnp

    from ssrl_vit_mae_jepa_tpu.data.loaders import DATA_DIR
    from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
    from ssrl_vit_mae_jepa_tpu.models import vit_from_config
    from ssrl_vit_mae_jepa_tpu.ops.augment import eval_transform
    from ssrl_vit_mae_jepa_tpu.utils.load import encoder_params_from_checkpoint
    import jax

    model_cfg = cfg["model"]
    vit = vit_from_config(model_cfg, dtype=jnp.float32)
    enc_params, _ = encoder_params_from_checkpoint(
        checkpoint, model_cfg["encoder"]["depth"]
    )
    # transform to the CONFIG's image size: the pos-embed length only
    # matches when the input is resized to it, not the 96px default
    size = int(model_cfg["general"].get("image_size", 96))

    @jax.jit
    def feats_fn(images_u8):
        x = eval_transform(images_u8, out_size=size)
        tokens = vit.apply({"params": enc_params}, x)
        if pool == "cls":
            return tokens[:, 0]
        return tokens[:, 1:].mean(axis=1)  # mean EXCLUDES CLS here (Q6)

    ds = STL10(data_dir or DATA_DIR, split)
    feats, labels = [], []
    for start in range(0, len(ds), batch_size):
        idx = np.arange(start, min(start + batch_size, len(ds)))
        f = np.asarray(feats_fn(jnp.asarray(ds.images_nhwc(idx))))
        feats.append(f)
        labels.append(ds.labels[idx])
    feats = np.concatenate(feats)
    labels = np.concatenate(labels)

    if normalize == "l2":
        feats = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-8)
    elif normalize == "channel":
        feats = (feats - feats.mean(0)) / np.maximum(feats.std(0), 1e-8)
    return feats, labels


def project_2d(feats, method="tsne", seed=73):
    if method == "umap":
        try:
            import umap  # optional; not in this image

            return umap.UMAP(random_state=seed).fit_transform(feats)
        except ImportError:
            # clean-room numpy UMAP (paper algorithm) so the reference's
            # default method executes without umap-learn — see
            # utils/umap_np.py
            from ssrl_vit_mae_jepa_tpu.utils.umap_np import umap_embed

            print("ℹ️  umap-learn not installed — using the built-in "
                  "numpy UMAP (ssrl_vit_mae_jepa_tpu.utils.umap_np)")
            return umap_embed(feats, random_state=seed)
    from sklearn.manifold import TSNE

    perplexity = min(30.0, max(2.0, (len(feats) - 1) / 3))
    return TSNE(
        n_components=2, random_state=seed, init="pca", perplexity=perplexity
    ).fit_transform(feats)


def main():
    parser = argparse.ArgumentParser(description="Visualize encoder representations")
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--pool", type=str, default="cls", choices=["cls", "mean"])
    parser.add_argument(
        "--normalize", type=str, default="none", choices=["none", "l2", "channel"]
    )
    parser.add_argument("--method", type=str, default="umap", choices=["umap", "tsne"])
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--tag", type=str, default="representation")
    parser.add_argument("--output_dir", type=str, default="assets/visualizations")
    args = parser.parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config
    from ssrl_vit_mae_jepa_tpu.data.stl10 import CLASSES

    cfg = load_config(args.config)
    feats, labels = extract_features(
        cfg, args.checkpoint, pool=args.pool, normalize=args.normalize,
        split=args.split,
    )
    print(f"🧮 Extracted features: {feats.shape}")
    xy = project_2d(feats, args.method)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("⚠️ matplotlib unavailable — skipping plots")
        return

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    base = f"{args.tag}_{args.method}_{args.pool}_{args.normalize}"

    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(xy[:, 0], xy[:, 1], c=labels, cmap="tab10", s=4, alpha=0.7)
    ax.set_title(f"{args.method.upper()} of encoder features ({args.pool} pool)")
    fig.colorbar(sc, ax=ax, ticks=range(10))
    fig.savefig(out_dir / f"{base}.png", dpi=120)
    plt.close(fig)

    for c in range(10):
        fig, ax = plt.subplots(figsize=(6, 6))
        mask = labels == c
        ax.scatter(xy[~mask, 0], xy[~mask, 1], c="lightgray", s=4, alpha=0.5)
        ax.scatter(xy[mask, 0], xy[mask, 1], c="tab:red", s=6, alpha=0.8)
        ax.set_title(f"class {c}: {CLASSES[c]}")
        fig.savefig(out_dir / f"{base}_class{c}.png", dpi=120)
        plt.close(fig)
    print(f"🖼️ Saved 11 plots to {out_dir}/{base}*.png")


if __name__ == "__main__":
    main()
