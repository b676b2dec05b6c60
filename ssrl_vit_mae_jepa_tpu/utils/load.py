"""Universal checkpoint loading with prefix detection.

Mirrors the reference's four load paths (``scripts/utils.py:40-148``):
None → random init (handled by callers), Lightning ``.ckpt`` classifier,
encoder-only ``.pt`` with prefix detection over ``model.encoder.`` /
``encoder.`` / ``module.encoder.``, and full classifier state dicts — and
extends each path to ALSO accept this framework's native checkpoints, so
the ablation drivers chain stages across either format transparently.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from ssrl_vit_mae_jepa_tpu.utils.checkpoint import (
    is_native_checkpoint,
    load_checkpoint,
)
from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti


def _native_params(path) -> Tuple[dict, dict]:
    state, meta = load_checkpoint(path)
    if isinstance(state, dict) and "params" in state:
        return state["params"], meta
    raise ValueError(f"native checkpoint {path} has no params tree")


def load_any(path: str | Path):
    """→ ("native", params, meta) | ("torch", flat_state_dict, {})."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(
            f"❌ Checkpoint not found: {path} — expected a native .ckpt, a "
            "torch .pt/.ckpt, or a weights export (see scripts.weight_utils)"
        )
    if is_native_checkpoint(path):
        params, meta = _native_params(path)
        return "native", params, meta
    flat = ti.load_torch_state_dict(path)
    return "torch", flat, {}


def encoder_params_from_checkpoint(
    path: str | Path, depth: int
) -> Tuple[dict, dict]:
    """Extract ViT-encoder params from any checkpoint kind → (params, report).

    Reference flow: ``scripts/training/train_mae.py:92-146``.
    """
    kind, state, _ = load_any(path)
    if kind == "native":
        if "encoder" in state:  # MAE or classifier params tree
            return state["encoder"], {"missing": [], "unexpected": []}
        raise ValueError(
            f"❌ Could not find encoder weights in native checkpoint {path}"
        )
    prefix = ti.detect_prefix(state)
    if prefix is None:
        raise ValueError(
            "❌ Could not find encoder weights in checkpoint. Expected keys "
            "starting with one of: " + ", ".join(ti.ENCODER_PREFIXES)
        )
    print(f"🔎 Detected encoder prefix in checkpoint: '{prefix}'")
    enc_state = ti.strip_prefix(state, prefix)
    params, report = ti.timm_vit_to_params(enc_state, depth)
    print(
        f"✅ Loaded encoder weights: {len(enc_state)} tensors "
        f"({len(report['missing'])} missing, {len(report['unexpected'])} unexpected)"
    )
    return params, report


def classifier_params_from_checkpoint(
    path: str | Path, depth: int
) -> Tuple[dict, dict, dict]:
    """Full classifier params from any checkpoint → (params, report, meta)."""
    kind, state, meta = load_any(path)
    if kind == "native":
        if "head" in state and "encoder" in state:
            return state, {"missing": [], "unexpected": []}, meta
        raise ValueError(f"{path}: native checkpoint is not a classifier")
    params, report = ti.classifier_state_to_params(state, depth)
    return params, report, meta


def mae_params_from_checkpoint(
    path: str | Path, depth: int, decoder_depth: int
) -> Tuple[dict, dict]:
    """Full MAE params (encoder+decoder) from any checkpoint kind."""
    kind, state, _ = load_any(path)
    if kind == "native":
        if "decoder" in state and "encoder" in state:
            return state, {"missing": [], "unexpected": []}
        raise ValueError(f"{path}: native checkpoint is not an MAE")
    return ti.mae_state_to_params(state, depth, decoder_depth)


def merge_encoder(params: dict, encoder_params: dict) -> dict:
    """Return params with the encoder subtree replaced (shape-checked)."""
    import jax

    def check(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape != b.shape:
            raise ValueError(f"encoder shape mismatch: {a.shape} vs {b.shape}")
        return b.astype(a.dtype)

    merged = dict(params)
    merged["encoder"] = jax.tree.map(check, params["encoder"], encoder_params)
    return merged
