"""Shared CLI helpers (reference contract: ``scripts/utils.py``).

- ``setup_reproducibility(seed)``: global seed discipline (reference
  ``scripts/utils.py:13-22``) — in JAX this returns an explicit PRNG key and
  honors a ``JAX_PLATFORMS`` override (the axon sitecustomize pins the
  platform config at interpreter start, so the env var must be re-applied).
- ``load_vit_classifier_from_checkpoint``: the reference's 4-path loader
  (``scripts/utils.py:40-148``) → (ClassifierTask, params).
- ``evaluate_checkpoint``: load → trainer.test → test_acc
  (``scripts/utils.py:151-204``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax


def setup_reproducibility(seed: int = 73):
    """Pin platform selection + return the root PRNG key for this process."""
    env = os.environ.get("JAX_PLATFORMS")
    if env and env not in ("axon", "axon,cpu"):
        try:
            jax.config.update("jax_platforms", env)
        except RuntimeError:
            pass  # backends already initialized
    return jax.random.PRNGKey(seed)


def shut_down_warnings() -> None:
    import logging
    import warnings

    warnings.filterwarnings("ignore", category=FutureWarning)
    logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)


def load_vit_classifier_from_checkpoint(
    model_cfg: dict,
    training_cfg: dict,
    checkpoint_path: Optional[str | Path] = None,
    encoder_only: bool = False,
    augment: bool = True,
):
    """4-path classifier loading → (ClassifierTask, params or None).

    Paths (reference ``scripts/utils.py:40-148``): None → random init;
    full-classifier checkpoint (native or torch, .ckpt or .pt); encoder-only
    checkpoint with prefix detection.
    """
    from ssrl_vit_mae_jepa_tpu.training.tasks import ClassifierTask
    from ssrl_vit_mae_jepa_tpu.utils.load import (
        classifier_params_from_checkpoint,
        encoder_params_from_checkpoint,
        merge_encoder,
    )

    print(f"🔁 Loading ViTClassifier from checkpoint: {checkpoint_path}")
    task = ClassifierTask(model_cfg, training_cfg, augment=augment)
    depth = model_cfg["encoder"]["depth"]

    if checkpoint_path is None:
        print("🔧 Classifier randomly initialized")
        return task, None

    if encoder_only:
        enc_params, _ = encoder_params_from_checkpoint(checkpoint_path, depth)
        rng = jax.random.PRNGKey(0)
        params = merge_encoder(task.init_params(rng), enc_params)
        print("🔧 Loaded encoder-only weights")
        return task, params

    params, report, _meta = classifier_params_from_checkpoint(
        checkpoint_path, depth
    )
    if report["missing"]:
        print(f"⚠️ Missing keys in checkpoint: {report['missing'][:5]} ...")
    print("🔧 Loaded full classifier weights")
    return task, params


def evaluate_checkpoint(cfg: dict, checkpoint_path: str | Path, test_loader):
    """Load a classifier checkpoint and evaluate on the given loader →
    test accuracy (reference ``scripts/utils.py:151-204``)."""
    from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

    test_cfg = cfg["test"]
    log_cfg = cfg["logging"]
    task, params = load_vit_classifier_from_checkpoint(
        model_cfg=cfg["model"],
        training_cfg=cfg["train"],
        checkpoint_path=checkpoint_path,
        encoder_only=False,
    )
    output_dir = (
        Path(log_cfg["output_dir_base"])
        / "test"
        / test_cfg.get("output_dir_suffix", "default")
    )
    trainer = Trainer(
        task,
        max_epochs=0,
        output_dir=output_dir,
        enable_checkpointing=False,
    )
    trainer.init_state()
    if params is not None:
        trainer.load_params_into_state(params)
    print("\n🚀 Starting evaluation...")
    results = trainer.test(test_loader)
    acc = results.get("test_acc")
    print(f"🔎 Test Accuracy: {acc}")
    if "test_top5" in results:
        print(f"🔎 Test Top-5 Accuracy: {results['test_top5']}")
    return acc
