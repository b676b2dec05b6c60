"""k-NN classification on frozen encoder features (representation ranking).

Soft-vote cosine k-NN (DINO/I-JEPA evaluation style): l2-normalized CLS
features of the labeled train split vote for each test image, weighted by
exp(sim/T) over the top-k neighbours. Unlike a trained linear probe, k-NN
has no optimizer to exploit a linearly-pixel-separable class signal — on
synthetic STL-10 a random encoder's linear probe saturates at the pixel
ceiling while its k-NN accuracy stays near the raw-pixel level, so this is
the diagnostic that actually ranks learned representations there
(docs/RESULTS.md, round-3 probe study).

No reference counterpart (the reference evaluates with linear probes only,
``scripts/evaluation/evaluate_classifier.py``); added as framework surface
for representation-quality triage.
"""

from __future__ import annotations

import argparse

import numpy as np

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)


def knn_predict(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    test_feats: np.ndarray,
    k: int = 20,
    temperature: float = 0.07,
    num_classes: int = 10,
) -> np.ndarray:
    """Soft-vote cosine k-NN: (N_test,) predicted labels."""

    def _l2(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-8)

    tr = _l2(train_feats.astype(np.float32))
    te = _l2(test_feats.astype(np.float32))
    sims = te @ tr.T  # (N_test, N_train) cosine similarities
    k = min(k, tr.shape[0])
    nn_idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    nn_sims = np.take_along_axis(sims, nn_idx, axis=1)
    nn_lab = train_labels[nn_idx]
    w = np.exp(nn_sims / temperature)
    votes = np.zeros((te.shape[0], num_classes), np.float64)
    for c in range(num_classes):
        votes[:, c] = np.where(nn_lab == c, w, 0.0).sum(axis=1)
    return votes.argmax(axis=1)


def random_encoder_features(cfg, pool, split, batch_size, data_dir):
    """Features from a seed-73 random-init encoder (no checkpoint)."""
    import jax
    import jax.numpy as jnp

    from ssrl_vit_mae_jepa_tpu.data.loaders import DATA_DIR
    from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
    from ssrl_vit_mae_jepa_tpu.models import vit_from_config
    from ssrl_vit_mae_jepa_tpu.ops.augment import eval_transform

    vit = vit_from_config(cfg["model"], dtype=jnp.float32)
    h = w = cfg["model"]["general"].get("image_size", 96)
    init = jax.jit(vit.init)
    params = init(
        jax.random.PRNGKey(73), jnp.zeros((1, h, w, 3), jnp.float32)
    )["params"]

    @jax.jit
    def feats_fn(images_u8):
        # out_size must follow the config: the ViT was initialized for
        # image_size (pos-embed length), not the 96px transform default
        x = eval_transform(images_u8, out_size=h)
        tokens = vit.apply({"params": params}, x)
        return tokens[:, 0] if pool == "cls" else tokens[:, 1:].mean(axis=1)

    ds = STL10(data_dir or DATA_DIR, split)
    feats, labels = [], []
    for start in range(0, len(ds), batch_size):
        idx = np.arange(start, min(start + batch_size, len(ds)))
        feats.append(np.asarray(feats_fn(jnp.asarray(ds.images_nhwc(idx)))))
        labels.append(ds.labels[idx])
    return np.concatenate(feats), np.concatenate(labels)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="configs/mae.yaml")
    ap.add_argument(
        "--checkpoint",
        required=True,
        help="encoder checkpoint (.ckpt/.pt), or 'random' for a seed-73 "
        "random-init baseline, or 'pixels' for raw-pixel k-NN",
    )
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--temperature", type=float, default=0.07)
    ap.add_argument("--pool", choices=["cls", "mean"], default="cls")
    ap.add_argument("--samples_per_class", type=int, default=0,
                    help="cap the train reference set (0 = all 5000)")
    ap.add_argument("--batch_size", type=int, default=500)
    ap.add_argument("--data_dir", default=None)
    ap.add_argument(
        "--eval", choices=["knn", "ridge", "both"], default="knn",
        help="'ridge' adds the closed-form ridge probe from "
        "validate_instrument — the strongest frozen linear attack (the "
        "10-step Adam probe in rank_study.sh under-trains; this one is "
        "optimizer-free)",
    )
    ap.add_argument("--ridge_lam", type=float, default=10.0)
    args = ap.parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config

    cfg = load_config(args.config)

    if args.checkpoint == "pixels":
        from ssrl_vit_mae_jepa_tpu.data.loaders import DATA_DIR
        from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10

        def _flat(split):
            ds = STL10(args.data_dir or DATA_DIR, split)
            imgs = ds.images_nhwc(np.arange(len(ds))).astype(np.float32)
            return imgs.reshape(len(ds), -1), ds.labels

        tr_f, tr_y = _flat("train")
        te_f, te_y = _flat("test")
    elif args.checkpoint == "random":
        tr_f, tr_y = random_encoder_features(
            cfg, args.pool, "train", args.batch_size, args.data_dir
        )
        te_f, te_y = random_encoder_features(
            cfg, args.pool, "test", args.batch_size, args.data_dir
        )
    else:
        from scripts.evaluation.visualize_representation import extract_features

        tr_f, tr_y = extract_features(
            cfg, args.checkpoint, pool=args.pool, split="train",
            batch_size=args.batch_size, data_dir=args.data_dir,
        )
        te_f, te_y = extract_features(
            cfg, args.checkpoint, pool=args.pool, split="test",
            batch_size=args.batch_size, data_dir=args.data_dir,
        )

    if args.samples_per_class:
        from ssrl_vit_mae_jepa_tpu.data.stl10 import stratified_split_indices

        idx, _ = stratified_split_indices(tr_y, args.samples_per_class, seed=73)
        tr_f, tr_y = tr_f[idx], tr_y[idx]

    acc = None
    if args.eval in ("knn", "both"):
        pred = knn_predict(
            tr_f, tr_y, te_f, k=args.k, temperature=args.temperature
        )
        acc = float((pred == te_y).mean())
        print(
            f"🔎 kNN(k={args.k}, T={args.temperature}, pool={args.pool}, "
            f"train={len(tr_y)}) test accuracy: {acc:.4f}"
        )
    if args.eval in ("ridge", "both"):
        from scripts.evaluation.validate_instrument import ridge_probe

        pred = ridge_probe(tr_f, tr_y, te_f, lam=args.ridge_lam)
        racc = float((pred == te_y).mean())
        print(
            f"🔎 ridge(lam={args.ridge_lam:g}, pool={args.pool}, "
            f"train={len(tr_y)}) test accuracy: {racc:.4f}"
        )
        acc = racc if acc is None else acc
    return acc


if __name__ == "__main__":
    main()
