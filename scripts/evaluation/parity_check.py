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


def _torch_block(t, p, x, heads):
    """One pre-LN timm block from raw state-dict tensors at prefix ``p``."""
    import torch

    B, L, D = x.shape
    hd = D // heads

    def ln(v, w, b):
        return torch.nn.functional.layer_norm(v, (D,), w, b, eps=1e-6)

    y = ln(x, t[p + "norm1.weight"], t[p + "norm1.bias"])
    qkv = y @ t[p + "attn.qkv.weight"].T + t[p + "attn.qkv.bias"]
    qkv = qkv.reshape(B, L, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = torch.softmax(q @ k.transpose(-2, -1) / hd**0.5, dim=-1)
    o = (att @ v).transpose(1, 2).reshape(B, L, D)
    x = x + o @ t[p + "attn.proj.weight"].T + t[p + "attn.proj.bias"]
    y = ln(x, t[p + "norm2.weight"], t[p + "norm2.bias"])
    h = torch.nn.functional.gelu(y @ t[p + "mlp.fc1.weight"].T + t[p + "mlp.fc1.bias"])
    return x + h @ t[p + "mlp.fc2.weight"].T + t[p + "mlp.fc2.bias"]


def torch_mae_forward(state, x_nchw, idx_keep, idx_mask, *, depth, heads,
                      dec_depth, dec_heads, patch):
    """Golden FULL MAE forward in torch from a reference-named state dict
    (``encoder.vit.*`` + ``decoder.*`` keys; reference ``src/models/mae.py:77-94``):
    masked encode → decoder embed → mask-token scatter → pos-embed → blocks →
    norm → gather ``idx_mask`` → pixel head; targets = CHW-within-patch
    patchify at ``clamp(idx_mask − 1, 0)``. Returns (pred, target) numpy."""
    import torch

    t = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in state.items()}
    x = torch.from_numpy(x_nchw)
    ik = torch.from_numpy(np.array(idx_keep)).long()
    im = torch.from_numpy(np.array(idx_mask)).long()
    B = x.shape[0]

    e = "encoder.vit."
    D = t[e + "cls_token"].shape[-1]
    tok = torch.nn.functional.conv2d(
        x, t[e + "patch_embed.proj.weight"], t[e + "patch_embed.proj.bias"],
        stride=patch,
    ).flatten(2).transpose(1, 2)
    tok = torch.cat([t[e + "cls_token"].expand(B, -1, -1), tok], dim=1)
    tok = tok + t[e + "pos_embed"]
    tok = torch.gather(tok, 1, ik.unsqueeze(-1).expand(-1, -1, D))
    for i in range(depth):
        tok = _torch_block(t, f"{e}blocks.{i}.", tok, heads)
    enc = torch.nn.functional.layer_norm(
        tok, (D,), t[e + "norm.weight"], t[e + "norm.bias"], eps=1e-6)

    d = "decoder."
    dd = t[d + "mask_token"].shape[-1]
    xd = enc @ t[d + "decoder_embed.weight"].T + t[d + "decoder_embed.bias"]
    L = t[d + "decoder_pos_embed"].shape[1]
    full = t[d + "mask_token"].expand(B, L, dd).clone()
    full.scatter_(1, ik.unsqueeze(-1).expand(-1, -1, dd), xd)
    full = full + t[d + "decoder_pos_embed"]
    for i in range(dec_depth):
        full = _torch_block(t, f"{d}decoder_blocks.{i}.", full, dec_heads)
    full = torch.nn.functional.layer_norm(
        full, (dd,), t[d + "decoder_norm.weight"], t[d + "decoder_norm.bias"],
        eps=1e-6)
    sel = torch.gather(full, 1, im.unsqueeze(-1).expand(-1, -1, dd))
    pred = sel @ t[d + "decoder_pred.weight"].T + t[d + "decoder_pred.bias"]

    gh = x.shape[-1] // patch
    patches = x.reshape(B, 3, gh, patch, gh, patch).permute(
        0, 2, 4, 1, 3, 5).reshape(B, gh * gh, patch * patch * 3)
    tgt = torch.gather(
        patches, 1,
        (im - 1).clamp(min=0).unsqueeze(-1).expand(-1, -1, patches.shape[-1]),
    )
    return pred.numpy(), tgt.numpy()


def check_file(checkpoint, cfg: dict, batch: int = 8, tol: float = 1e-3) -> bool:
    """Golden-check one torch checkpoint against our converter + flax models.

    Covers encoder features always; the full MAE (pred, target) pipeline when
    decoder weights are present; classifier logits + top-1 agreement when a
    head is present. Returns True when every applicable check passes."""
    import jax
    import jax.numpy as jnp

    from ssrl_vit_mae_jepa_tpu.models import classifier_from_config, vit_from_config
    from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti
    from ssrl_vit_mae_jepa_tpu.utils.load import classifier_params_from_checkpoint

    model_cfg = cfg["model"]
    depth = model_cfg["encoder"]["depth"]
    heads = model_cfg["encoder"]["num_heads"]
    p = model_cfg["general"]["patch_size"]

    flat = ti.load_torch_state_dict(checkpoint)
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
    x = rng.normal(0, 1, (batch, 3, img_size, img_size)).astype(np.float32)
    golden = torch_forward_features(enc_state, x, depth, heads, p)
    vit = vit_from_config(model_cfg, dtype=jnp.float32, attn_impl="xla")
    ours = np.asarray(
        jax.jit(vit.apply)({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    err = np.abs(ours - golden)
    rel = err.max() / max(np.abs(golden).max(), 1e-9)
    print(f"🔬 encoder features: max abs err {err.max():.3e} "
          f"(rel {rel:.3e}, mean {err.mean():.3e})")
    ok = err.max() < tol

    mae_state = flat
    if not any(k.startswith("decoder.") for k in mae_state):
        for pref in ("model.", "module."):
            if any(k.startswith(pref + "decoder.") for k in mae_state):
                mae_state = {k[len(pref):]: v for k, v in mae_state.items()
                             if k.startswith(pref)}
                break
    if any(k.startswith("decoder.") for k in mae_state):
        # MAE checkpoint: verify the FULL (pred, target) pipeline — encoder
        # masked-encode AND decoder numerics — against the torch golden
        import jax

        from ssrl_vit_mae_jepa_tpu.models import mae_from_config
        from ssrl_vit_mae_jepa_tpu.ops.masking import (
            num_masked_tokens,
            random_token_mask,
        )
        from ssrl_vit_mae_jepa_tpu.utils.load import mae_params_from_checkpoint

        dec_depth = model_cfg["decoder"]["decoder_depth"]
        dec_heads = model_cfg["decoder"]["decoder_num_heads"]
        mae_params, mrep = mae_params_from_checkpoint(
            checkpoint, depth, dec_depth)
        if mrep["missing"]:
            raise SystemExit(f"❌ MAE converter missing keys: {mrep['missing']}")
        mae = mae_from_config(model_cfg, dtype=jnp.float32, attn_impl="xla")
        L = mae.sequence_length
        idx_keep, idx_mask = random_token_mask(
            jax.random.PRNGKey(42), batch, L, num_masked_tokens(L, 0.75))
        pred, target = jax.jit(mae.apply)(
            {"params": mae_params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
            idx_keep, idx_mask)
        g_pred, g_target = torch_mae_forward(
            mae_state, x, np.asarray(idx_keep), np.asarray(idx_mask),
            depth=depth, heads=heads, dec_depth=dec_depth,
            dec_heads=dec_heads, patch=p)
        derr = np.abs(np.asarray(pred) - g_pred).max()
        terr = np.abs(np.asarray(target) - g_target).max()
        print(f"🔬 MAE decoder pred: max abs err {derr:.3e}; "
              f"pixel targets: max abs err {terr:.3e}")
        ok = ok and derr < tol and terr == 0.0

    if any("head.classification" in k for k in flat):
        clf_params, _, _ = classifier_params_from_checkpoint(checkpoint, depth)
        clf = classifier_from_config(model_cfg, dtype=jnp.float32, attn_impl="xla")
        logits = np.asarray(
            jax.jit(clf.apply)({"params": clf_params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        )
        w = flat[[k for k in flat if k.endswith("head.classification.weight")][0]]
        b = flat[[k for k in flat if k.endswith("head.classification.bias")][0]]
        # pool per config: the flax classifier obeys head.pool, so the
        # golden must too (mean INCLUDES CLS — quirk Q6)
        pool = model_cfg.get("head", {}).get("pool", "cls")
        pooled = golden[:, 0] if pool == "cls" else golden.mean(axis=1)
        golden_logits = pooled @ np.asarray(w, np.float32).T + np.asarray(b, np.float32)
        lerr = np.abs(logits - golden_logits).max()
        agree = (logits.argmax(1) == golden_logits.argmax(1)).mean()
        print(f"🔬 classifier logits: max abs err {lerr:.3e}, "
              f"top-1 agreement {agree:.1%}")
        ok = ok and lerr < 10 * tol and agree == 1.0

    print("✅ PARITY OK" if ok else "❌ PARITY FAILED")
    return ok


def main():
    parser = argparse.ArgumentParser(description="Verify converted-checkpoint fidelity")
    parser.add_argument("checkpoint", type=str, help="reference torch .pt/.ckpt")
    parser.add_argument("--config", type=str, default="configs/mae.yaml")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--tol", type=float, default=1e-3)
    args = parser.parse_args()

    from ssrl_vit_mae_jepa_tpu.config import load_config

    cfg = load_config(args.config)
    ok = check_file(args.checkpoint, cfg, batch=args.batch, tol=args.tol)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
