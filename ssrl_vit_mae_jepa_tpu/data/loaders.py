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


def _shard_for_process(indices: np.ndarray, batch_size: int):
    """Multihost: per-process index shard + per-process batch size.

    The config batch size is the GLOBAL batch. Under ``jax.process_count()
    > 1`` the prefetcher assembles global arrays from process-local data
    (``parallel.multihost.global_batch``), so each process must feed a
    disjoint index shard at ``batch_size // process_count`` rows — without
    this every process would feed the SAME full batch and training would
    silently run on duplicated data at an inflated effective batch.
    Single-process is the identity. Shards are contiguous and fixed per
    run (each process re-shuffles its own shard per epoch).
    """
    import jax

    pc = jax.process_count()
    if pc == 1:
        return indices, batch_size
    from ssrl_vit_mae_jepa_tpu.parallel.multihost import process_local_indices

    if batch_size % pc:
        raise ValueError(
            f"global batch_size {batch_size} not divisible by "
            f"process_count {pc}"
        )
    return process_local_indices(indices), batch_size // pc


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
    global_bs = pre_cfg.get("batch_size", 512)
    depth = max(2, pre_cfg.get("num_workers", 4) // 2)
    train_idx, batch_size = _shard_for_process(train_idx, global_bs)
    val_idx, _ = _shard_for_process(val_idx, global_bs)
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
    global_bs = train_cfg.get("batch_size", 256)
    depth = max(2, train_cfg.get("num_workers", 4) // 2)
    train_idx, batch_size = _shard_for_process(train_idx, global_bs)
    val_idx, _ = _shard_for_process(val_idx, global_bs)
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
    idx, batch_size = _shard_for_process(np.arange(len(ds)), batch_size)
    return HostLoader(ds, idx, batch_size, shuffle=False)
