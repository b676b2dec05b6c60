"""Dataloader factories matching the reference's ``src/data.py`` API.

``get_pretrain_dataloaders`` / ``get_train_dataloaders`` / ``get_test_dataloader``
(reference ``src/data.py:45,109,167``) with identical split semantics
(quirks Q4/Q5 preserved; see ``data.stl10``). Transform handling differs
deliberately: the reference mutates the *shared* dataset transform so its
train subsets silently lose augmentation (quirk Q1, ``src/data.py:76-81``);
here the loaders only move uint8 pixels — augmentation happens on-device in
the training task, controlled by the task's config (``pretrain.augment``),
so a parity experiment reproduces quirk Q1 by setting that flag to false.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader
from ssrl_vit_mae_jepa_tpu.data.stl10 import (
    STL10,
    pretrain_split_indices,
    stratified_split_indices,
)

import os

ROOT_DIR = Path(__file__).resolve().parents[2]
DATA_DIR = Path(os.environ.get("SSRL_DATA_DIR", ROOT_DIR / "data"))


def get_pretrain_dataloaders(
    cfg: dict, data_dir: str | Path | None = None
) -> Tuple[HostLoader, HostLoader]:
    """Unlabeled STL-10 → (train, val) loaders (reference ``src/data.py:45-106``)."""
    pre_cfg = cfg["pretrain"]
    seed = cfg.get("seed", 73)
    ds = STL10(data_dir or DATA_DIR, split="unlabeled")
    train_idx, val_idx = pretrain_split_indices(
        len(ds),
        pre_cfg.get("data_fraction", 1.0),
        pre_cfg.get("val_split", 0.1),
        seed,
    )
    batch_size = pre_cfg.get("batch_size", 512)
    depth = max(2, pre_cfg.get("num_workers", 4) // 2)
    train = HostLoader(ds, train_idx, batch_size, shuffle=True, seed=seed)
    val = HostLoader(ds, val_idx, batch_size, shuffle=False, seed=seed)
    train.prefetch_depth = val.prefetch_depth = depth
    print(
        f"📦 Unlabeled pretrain split: {len(train_idx)} train, {len(val_idx)} val "
        f"({pre_cfg.get('val_split', 0.1) * 100:.1f}% validation)"
    )
    return train, val


def get_train_dataloaders(
    cfg: dict, data_dir: str | Path | None = None
) -> Tuple[HostLoader, HostLoader]:
    """Labeled STL-10 → (train, val) loaders (reference ``src/data.py:109-164``)."""
    train_cfg = cfg["train"]
    seed = cfg.get("seed", 73)
    ds = STL10(data_dir or DATA_DIR, split="train")
    samples_per_class = train_cfg.get("samples_per_class", 400)
    train_idx, val_idx = stratified_split_indices(
        np.asarray(ds.labels), samples_per_class, seed
    )
    print(
        f"⚙️ Using {samples_per_class} samples/class → {len(train_idx)} train, "
        f"{len(val_idx)} val"
    )
    batch_size = train_cfg.get("batch_size", 256)
    depth = max(2, train_cfg.get("num_workers", 4) // 2)
    train = HostLoader(ds, train_idx, batch_size, shuffle=True, seed=seed)
    val = HostLoader(ds, val_idx, batch_size, shuffle=False, seed=seed)
    train.prefetch_depth = val.prefetch_depth = depth
    return train, val


def get_test_dataloader(cfg: dict, data_dir: str | Path | None = None) -> HostLoader:
    """STL-10 test split loader (reference ``src/data.py:167-185``)."""
    test_cfg = cfg.get("test", {})
    batch_size = test_cfg.get("batch_size", 256)
    ds = STL10(data_dir or DATA_DIR, split="test")
    print(f"🧪 Loaded STL-10 test split: {len(ds)} samples")
    return HostLoader(ds, np.arange(len(ds)), batch_size, shuffle=False)
