"""Checkpoint-fidelity verifier: converted torch weights vs a golden torch
forward.

BASELINE.json requires converters "to verify output fidelity". For a given
reference checkpoint this CLI:

1. converts the encoder weights to a JAX param tree
   (``utils.torch_interop``),
2. runs OUR flax ViT on a random (or real STL-10) batch,
3. runs an INDEPENDENT torch implementation of the timm
   ``forward_features`` contract directly from the raw state dict,
4. reports max-abs / rel feature error (and classifier-logit error +
   top-1 agreement when the checkpoint carries a head).

Requires torch (cpu) — baked into this image.
"""

from __future__ import annotations

import argparse

import numpy as np

from scripts.utils import setup_reproducibility, shut_down_warnings

shut_down_warnings()
setup_reproducibility(seed=73)


def torch_forward_features(state, x_nchw, depth, num_heads, patch_size):
    """Golden timm-contract forward in torch, from raw state-dict tensors."""
    import torch

    t = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in state.items()}
    x = torch.from_numpy(x_nchw)
    B = x.shape[0]
    D = t["cls_token"].shape[-1]
    x = torch.nn.functional.conv2d(
        x, t["patch_embed.proj.weight"], t["patch_embed.proj.bias"],
        stride=patch_size,
    )
    x = x.flatten(2).transpose(1, 2)
    x = torch.cat([t["cls_token"].expand(B, -1, -1), x], dim=1) + t["pos_embed"]

    def ln(v, w, b):
        return torch.nn.functional.layer_norm(v, (D,), w, b, eps=1e-6)

    hd = D // num_heads
    for i in range(depth):
        b = f"blocks.{i}."
        y = ln(x, t[b + "norm1.weight"], t[b + "norm1.bias"])
        qkv = y @ t[b + "attn.qkv.weight"].T + t[b + "attn.qkv.bias"]
        L = y.shape[1]
        qkv = qkv.reshape(B, L, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-2, -1) / hd**0.5, dim=-1)
        o = (att @ v).transpose(1, 2).reshape(B, L, D)
        x = x + o @ t[b + "attn.proj.weight"].T + t[b + "attn.proj.bias"]
        y = ln(x, t[b + "norm2.weight"], t[b + "norm2.bias"])
        h = torch.nn.functional.gelu(y @ t[b + "mlp.fc1.weight"].T + t[b + "mlp.fc1.bias"])
        x = x + h @ t[b + "mlp.fc2.weight"].T + t[b + "mlp.fc2.bias"]
    return ln(x, t["norm.weight"], t["norm.bias"]).numpy()


def main():
    parser = argparse.ArgumentParser(description="Verify converted-checkpoint fidelity")
    parser.add_argument("checkpoint", type=str, help="reference torch .pt/.ckpt")
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--tol", type=float, default=1e-3)
    args = parser.parse_args()

    import jax.numpy as jnp

    from ssrl_vit_mae_jepa_tpu.config import load_config
    from ssrl_vit_mae_jepa_tpu.models import classifier_from_config, vit_from_config
    from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti
    from ssrl_vit_mae_jepa_tpu.utils.load import classifier_params_from_checkpoint

    cfg = load_config(args.config)
    model_cfg = cfg["model"]
    depth = model_cfg["encoder"]["depth"]
    heads = model_cfg["encoder"]["num_heads"]
    p = model_cfg["general"]["patch_size"]

    flat = ti.load_torch_state_dict(args.checkpoint)
    prefix = ti.detect_prefix(flat) or ""
    enc_state = ti.strip_prefix(flat, prefix) if prefix else flat
    if ti.detect_prefix(enc_state, ["vit."]):
        enc_state = {k[len("vit."):]: v for k, v in enc_state.items()
                     if k.startswith("vit.")}
    params, report = ti.timm_vit_to_params(enc_state, depth)
    if report["missing"]:
        raise SystemExit(f"❌ converter missing keys: {report['missing']}")

    img_size = model_cfg["general"]["image_size"]
    rng = np.random.default_rng(73)
    x = rng.normal(0, 1, (args.batch, 3, img_size, img_size)).astype(np.float32)
    golden = torch_forward_features(enc_state, x, depth, heads, p)
    vit = vit_from_config(model_cfg, dtype=jnp.float32, attn_impl="xla")
    ours = np.asarray(
        vit.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    err = np.abs(ours - golden)
    rel = err.max() / max(np.abs(golden).max(), 1e-9)
    print(f"🔬 encoder features: max abs err {err.max():.3e} "
          f"(rel {rel:.3e}, mean {err.mean():.3e})")
    ok = err.max() < args.tol

    if any("head.classification" in k for k in flat):
        clf_params, _, _ = classifier_params_from_checkpoint(args.checkpoint, depth)
        clf = classifier_from_config(model_cfg, dtype=jnp.float32, attn_impl="xla")
        logits = np.asarray(
            clf.apply({"params": clf_params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        )
        w = flat[[k for k in flat if k.endswith("head.classification.weight")][0]]
        b = flat[[k for k in flat if k.endswith("head.classification.bias")][0]]
        pooled = golden[:, 0]
        golden_logits = pooled @ np.asarray(w, np.float32).T + np.asarray(b, np.float32)
        lerr = np.abs(logits - golden_logits).max()
        agree = (logits.argmax(1) == golden_logits.argmax(1)).mean()
        print(f"🔬 classifier logits: max abs err {lerr:.3e}, "
              f"top-1 agreement {agree:.1%}")
        ok = ok and lerr < 10 * args.tol and agree == 1.0

    print("✅ PARITY OK" if ok else "❌ PARITY FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
