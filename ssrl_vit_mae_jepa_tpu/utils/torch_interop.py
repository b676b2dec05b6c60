"""Torch checkpoint ⇄ JAX pytree converters.

Gates the parity claim (SURVEY.md §7 hard-part 1): reference checkpoints are
Lightning ``.ckpt`` / raw ``.pt`` state dicts with timm/lightly parameter
names; this module maps them onto our flax param trees and back.

Name contracts converted here:
- timm ``VisionTransformer`` (``cls_token``, ``pos_embed``,
  ``patch_embed.proj.{weight,bias}``, ``blocks.{i}.{norm1,attn.qkv,
  attn.proj,norm2,mlp.fc1,mlp.fc2}``, ``norm``) — reference
  ``src/models/mae.py:28-36``,
- lightly ``MaskedVisionTransformerTIMM`` (adds a ``vit.`` prefix and an
  encoder-side ``mask_token`` we ignore) — ``src/models/mae.py:38``,
- lightly ``MAEDecoderTIMM`` (``decoder_embed``, ``mask_token``,
  ``decoder_pos_embed``, ``decoder_blocks.{i}``, ``decoder_norm``,
  ``decoder_pred``) — ``src/models/mae.py:45-52``,
- ``ViTClassifier`` (``encoder.*`` + ``head.classification.*``) —
  ``src/models/classifier.py:25-57``.

Weight-layout transforms: torch Linear stores (out, in) → flax kernel is the
transpose; torch conv patch-embed (D, C, p, p) flattens (C-major) to the
kernel of our patchify-matmul embedding, whose patch layout is CHW-within-
patch by construction (``ops.patches``).

``torch.load`` is used when available (torch-cpu is in the image); loading
raises a clear error otherwise.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

ENCODER_PREFIXES = ["model.encoder.", "encoder.", "module.encoder."]


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load a torch ``.pt``/``.ckpt`` → flat {name: np.ndarray}.

    Unwraps Lightning's ``state_dict`` key (reference
    ``scripts/training/train_mae.py:103``).
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "loading torch checkpoints requires torch (cpu) to be installed"
        ) from e
    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().float().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def detect_prefix(
    keys: Iterable[str], candidates: List[str] = ENCODER_PREFIXES
) -> Optional[str]:
    """First candidate prefix present among keys (reference
    ``train_mae.py:106-124``)."""
    keys = list(keys)
    for p in candidates:
        if any(k.startswith(p) for k in keys):
            return p
    return None


def strip_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# timm ViT → flax params
# ---------------------------------------------------------------------------

def _set(tree: dict, path: List[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _block_entries(i: int, torch_prefix: str, flax_name: str):
    """(torch key suffix → flax path) for one transformer block."""
    tb = f"{torch_prefix}.{i}."
    fb = [flax_name]
    return [
        (tb + "norm1.weight", fb + ["norm1", "scale"], None),
        (tb + "norm1.bias", fb + ["norm1", "bias"], None),
        (tb + "attn.qkv.weight", fb + ["attn", "qkv", "kernel"], "T"),
        (tb + "attn.qkv.bias", fb + ["attn", "qkv", "bias"], None),
        (tb + "attn.proj.weight", fb + ["attn", "proj", "kernel"], "T"),
        (tb + "attn.proj.bias", fb + ["attn", "proj", "bias"], None),
        (tb + "norm2.weight", fb + ["norm2", "scale"], None),
        (tb + "norm2.bias", fb + ["norm2", "bias"], None),
        (tb + "mlp.fc1.weight", fb + ["mlp", "fc1", "kernel"], "T"),
        (tb + "mlp.fc1.bias", fb + ["mlp", "fc1", "bias"], None),
        (tb + "mlp.fc2.weight", fb + ["mlp", "fc2", "kernel"], "T"),
        (tb + "mlp.fc2.bias", fb + ["mlp", "fc2", "bias"], None),
    ]


def _apply_entries(state, entries, tree, used):
    missing = []
    for torch_key, flax_path, tform in entries:
        if torch_key not in state:
            missing.append(torch_key)
            continue
        v = state[torch_key]
        if tform == "T":
            v = np.ascontiguousarray(v.T)
        elif tform == "patch":
            v = np.ascontiguousarray(v.reshape(v.shape[0], -1).T)
        _set(tree, flax_path, v)
        used.add(torch_key)
    return missing


def timm_vit_to_params(
    state: Dict[str, np.ndarray], depth: int
) -> Tuple[dict, dict]:
    """timm ViT state dict → flax ViT params. Accepts an optional ``vit.``
    prefix (lightly wrapper). Returns (params, report{missing, unexpected})."""
    if detect_prefix(state, ["vit."]):
        state = {
            k[len("vit."):] if k.startswith("vit.") else k: v
            for k, v in state.items()
        }
    entries = _vit_entries(depth)  # single table shared with the export dir.
    tree: dict = {}
    used: set = set()
    missing = _apply_entries(state, entries, tree, used)
    unexpected = sorted(set(state) - used)
    return tree, {"missing": missing, "unexpected": unexpected}


def lightly_decoder_to_params(
    state: Dict[str, np.ndarray], depth: int
) -> Tuple[dict, dict]:
    """lightly MAEDecoderTIMM state dict → flax MAEDecoder params."""
    entries = _decoder_entries(depth)  # single table shared with export
    tree: dict = {}
    used: set = set()
    missing = _apply_entries(state, entries, tree, used)
    unexpected = sorted(set(state) - used)
    return tree, {"missing": missing, "unexpected": unexpected}


def mae_state_to_params(
    state: Dict[str, np.ndarray], depth: int, decoder_depth: int
) -> Tuple[dict, dict]:
    """Full MAE state dict (``encoder.*`` + ``decoder.*``, possibly under a
    ``model.`` Lightning prefix) → MaskedAutoencoder params."""
    if detect_prefix(state, ["model."]):
        state = strip_prefix(state, "model.")
    enc_state = strip_prefix(state, "encoder.")
    dec_state = strip_prefix(state, "decoder.")
    enc, enc_rep = timm_vit_to_params(enc_state, depth)
    dec, dec_rep = lightly_decoder_to_params(dec_state, decoder_depth)
    report = {
        "missing": enc_rep["missing"] + dec_rep["missing"],
        "unexpected": enc_rep["unexpected"] + dec_rep["unexpected"],
    }
    return {"encoder": enc, "decoder": dec}, report


def classifier_state_to_params(
    state: Dict[str, np.ndarray], depth: int
) -> Tuple[dict, dict]:
    """ViTClassifier state dict (``encoder.*`` timm + ``head.classification.*``,
    possibly under ``model.``) → ViTClassifier params."""
    if detect_prefix(state, ["model."]):
        state = strip_prefix(state, "model.")
    enc, rep = timm_vit_to_params(strip_prefix(state, "encoder."), depth)
    tree = {"encoder": enc}
    used_head = []
    if "head.classification.weight" in state:
        _set(tree, ["head", "classification", "kernel"],
             np.ascontiguousarray(state["head.classification.weight"].T))
        used_head.append("head.classification.weight")
    else:
        rep["missing"].append("head.classification.weight")
    if "head.classification.bias" in state:
        _set(tree, ["head", "classification", "bias"],
             state["head.classification.bias"])
        used_head.append("head.classification.bias")
    else:
        rep["missing"].append("head.classification.bias")
    return tree, rep


# ---------------------------------------------------------------------------
# flax params → reference-style (torch-named) state dicts
#
# The inverse direction walks the SAME entry tables used for import, so the
# two directions cannot drift: for every (torch_key, flax_path, transform)
# row we read the flax leaf, invert the layout transform, and emit the torch
# key. This makes a rebuilt ``vit-mae.pt`` loadable by the reference's torch
# stack (``torch.save(model.state_dict())`` contract at reference
# ``scripts/training/pretrain_mae.py:133-134`` / ``train_mae.py:222-223``).
# ---------------------------------------------------------------------------

def _get(tree: dict, path: List[str]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _vit_entries(depth: int):
    entries = [
        ("cls_token", ["cls_token"], None),
        ("pos_embed", ["pos_embed"], None),
        ("patch_embed.proj.weight", ["patch_embed", "kernel"], "patch"),
        ("patch_embed.proj.bias", ["patch_embed", "bias"], None),
        ("norm.weight", ["norm", "scale"], None),
        ("norm.bias", ["norm", "bias"], None),
    ]
    for i in range(depth):
        entries += _block_entries(i, "blocks", f"blocks_{i}")
    return entries


def _decoder_entries(depth: int):
    entries = [
        ("decoder_embed.weight", ["decoder_embed", "kernel"], "T"),
        ("decoder_embed.bias", ["decoder_embed", "bias"], None),
        ("mask_token", ["mask_token"], None),
        ("decoder_pos_embed", ["decoder_pos_embed"], None),
        ("decoder_norm.weight", ["decoder_norm", "scale"], None),
        ("decoder_norm.bias", ["decoder_norm", "bias"], None),
        ("decoder_pred.weight", ["decoder_pred", "kernel"], "T"),
        ("decoder_pred.bias", ["decoder_pred", "bias"], None),
    ]
    for i in range(depth):
        entries += _block_entries(i, "decoder_blocks", f"decoder_blocks_{i}")
    return entries


def _infer_depth(params: dict, block_prefix: str) -> int:
    return sum(1 for k in params if k.startswith(block_prefix))


def _export_entries(
    params: dict, entries, in_chans: int = 3
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for torch_key, flax_path, tform in entries:
        v = _get(params, flax_path)
        if v is None:
            raise KeyError(
                f"export: flax param {'/'.join(flax_path)} (→ {torch_key}) missing"
            )
        v = np.asarray(v, dtype=np.float32)
        if tform == "T":
            v = np.ascontiguousarray(v.T)
        elif tform == "patch":
            # invert the C-major flatten of the patchify-matmul kernel:
            # (p*p*C, D) → (D, C, p, p)
            p2c, D = v.shape
            p = int(round((p2c // in_chans) ** 0.5))
            v = np.ascontiguousarray(v.T.reshape(D, in_chans, p, p))
        out[torch_key] = v
    return out


def vit_params_to_timm_state(
    params: dict, in_chans: int = 3
) -> Dict[str, np.ndarray]:
    """Export: flax ViT params → timm-named state dict (torch layouts)."""
    depth = _infer_depth(params, "blocks_")
    return _export_entries(params, _vit_entries(depth), in_chans)


def decoder_params_to_lightly_state(params: dict) -> Dict[str, np.ndarray]:
    """Export: flax MAEDecoder params → lightly MAEDecoderTIMM state dict."""
    depth = _infer_depth(params, "decoder_blocks_")
    return _export_entries(params, _decoder_entries(depth))


def mae_params_to_state(params: dict, in_chans: int = 3) -> Dict[str, np.ndarray]:
    """Export: MaskedAutoencoder params → the reference's ``vit-mae.pt`` names.

    Layout matches ``MaskedAutoencoder.state_dict()`` in the reference
    (``src/models/mae.py:15-52``): the encoder is lightly's
    ``MaskedVisionTransformerTIMM`` (timm keys under ``encoder.vit.`` plus an
    encoder-level ``mask_token`` that the MAE forward never uses — emitted as
    zeros so strict torch loading succeeds), the decoder is
    ``MAEDecoderTIMM`` under ``decoder.``.
    """
    enc = vit_params_to_timm_state(params["encoder"], in_chans)
    dec = decoder_params_to_lightly_state(params["decoder"])
    out = {f"encoder.vit.{k}": v for k, v in enc.items()}
    embed_dim = enc["cls_token"].shape[-1]
    out["encoder.mask_token"] = np.zeros((1, 1, embed_dim), np.float32)
    out.update({f"decoder.{k}": v for k, v in dec.items()})
    return out


def classifier_params_to_state(
    params: dict, in_chans: int = 3
) -> Dict[str, np.ndarray]:
    """Export: ViTClassifier params → the reference's classifier names
    (``encoder.*`` timm keys + ``head.classification.{weight,bias}``,
    reference ``src/models/classifier.py:25-57``)."""
    enc = vit_params_to_timm_state(params["encoder"], in_chans)
    out = {f"encoder.{k}": v for k, v in enc.items()}
    head = params["head"]["classification"]
    out["head.classification.weight"] = np.ascontiguousarray(
        np.asarray(head["kernel"], dtype=np.float32).T
    )
    out["head.classification.bias"] = np.asarray(head["bias"], dtype=np.float32)
    return out


def export_reference_weights(path: str | Path, params: dict) -> bool:
    """Write ``params`` as the reference's torch-readable terminal artifact.

    Auto-detects the model kind from the tree (``decoder`` → MAE,
    ``head`` → classifier, else bare encoder) and ``torch.save``s the
    reference-named state dict. Returns False (no file written) when torch
    is not importable, so callers can fall back to a native checkpoint.
    """
    try:
        import torch  # noqa: F401
    except ImportError:  # pragma: no cover
        return False
    if "decoder" in params:
        state = mae_params_to_state(params)
    elif "head" in params:
        state = classifier_params_to_state(params)
    else:
        state = vit_params_to_timm_state(params.get("encoder", params))
    save_torch_state_dict(state, path)
    return True


def save_torch_state_dict(state: Dict[str, np.ndarray], path: str | Path) -> None:
    """``torch.save`` a {name: array} dict as real torch tensors."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "writing torch checkpoints requires torch (cpu) to be installed"
        ) from e
    torch.save(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in state.items()},
        str(path),
    )
