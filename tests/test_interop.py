"""Torch-checkpoint converter tests, incl. numerical forward parity.

The golden parity test builds an INDEPENDENT torch implementation of the
timm ViT contract (pre-LN blocks, exact GELU, LN eps 1e-6, conv patch-embed)
directly from a synthetic timm-named state dict, and checks our flax model
with converted params produces the same features — validating both the name
mapping and the model semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from scripts.evaluation import parity_check as _pc
from ssrl_vit_mae_jepa_tpu.models import classifier_from_config, mae_from_config, vit_from_config
from ssrl_vit_mae_jepa_tpu.utils import torch_interop as ti
from ssrl_vit_mae_jepa_tpu.utils.checkpoint import (
    is_native_checkpoint,
    is_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from ssrl_vit_mae_jepa_tpu.utils.load import (
    classifier_params_from_checkpoint,
    encoder_params_from_checkpoint,
    mae_params_from_checkpoint,
)

D, DEPTH, HEADS, P, IMG = 48, 2, 4, 8, 32  # tiny: 16 patches + CLS = 17 tokens
MODEL_CFG = {
    "general": {"image_size": IMG, "patch_size": P, "in_chans": 3},
    "encoder": {"embed_dim": D, "depth": DEPTH, "num_heads": HEADS},
    "decoder": {"decoder_embed_dim": 40, "decoder_depth": 1, "decoder_num_heads": 4},
    "head": {"pool": "cls"},
}


def make_timm_state(rng, prefix="", img=IMG):
    """Synthetic timm-ViT-named state dict (torch layouts)."""
    r = np.random.default_rng(rng)
    n_tok = (img // P) ** 2 + 1
    s = {
        "cls_token": r.normal(0, 0.02, (1, 1, D)),
        "pos_embed": r.normal(0, 0.02, (1, n_tok, D)),
        "patch_embed.proj.weight": r.normal(0, 0.05, (D, 3, P, P)),
        "patch_embed.proj.bias": r.normal(0, 0.02, (D,)),
        "norm.weight": r.normal(1, 0.02, (D,)),
        "norm.bias": r.normal(0, 0.02, (D,)),
    }
    for i in range(DEPTH):
        b = f"blocks.{i}."
        s.update({
            b + "norm1.weight": r.normal(1, 0.02, (D,)),
            b + "norm1.bias": r.normal(0, 0.02, (D,)),
            b + "attn.qkv.weight": r.normal(0, 0.05, (3 * D, D)),
            b + "attn.qkv.bias": r.normal(0, 0.02, (3 * D,)),
            b + "attn.proj.weight": r.normal(0, 0.05, (D, D)),
            b + "attn.proj.bias": r.normal(0, 0.02, (D,)),
            b + "norm2.weight": r.normal(1, 0.02, (D,)),
            b + "norm2.bias": r.normal(0, 0.02, (D,)),
            b + "mlp.fc1.weight": r.normal(0, 0.05, (4 * D, D)),
            b + "mlp.fc1.bias": r.normal(0, 0.02, (4 * D,)),
            b + "mlp.fc2.weight": r.normal(0, 0.05, (D, 4 * D)),
            b + "mlp.fc2.bias": r.normal(0, 0.02, (D,)),
        })
    return {prefix + k: v.astype(np.float32) for k, v in s.items()}


def make_decoder_state(rng, dd=40, prefix="decoder.", img=IMG):
    """Synthetic lightly-MAEDecoderTIMM-named state dict (torch layouts)."""
    r = np.random.default_rng(rng)
    n_tok = (img // P) ** 2 + 1
    s = {
        "decoder_embed.weight": r.normal(0, 0.05, (dd, D)),
        "decoder_embed.bias": np.zeros(dd),
        "mask_token": r.normal(0, 0.02, (1, 1, dd)),
        "decoder_pos_embed": r.normal(0, 0.02, (1, n_tok, dd)),
        "decoder_norm.weight": np.ones(dd),
        "decoder_norm.bias": np.zeros(dd),
        "decoder_pred.weight": r.normal(0, 0.05, (P * P * 3, dd)),
        "decoder_pred.bias": np.zeros(P * P * 3),
        "decoder_blocks.0.norm1.weight": np.ones(dd),
        "decoder_blocks.0.norm1.bias": np.zeros(dd),
        "decoder_blocks.0.attn.qkv.weight": r.normal(0, 0.05, (3 * dd, dd)),
        "decoder_blocks.0.attn.qkv.bias": np.zeros(3 * dd),
        "decoder_blocks.0.attn.proj.weight": r.normal(0, 0.05, (dd, dd)),
        "decoder_blocks.0.attn.proj.bias": np.zeros(dd),
        "decoder_blocks.0.norm2.weight": np.ones(dd),
        "decoder_blocks.0.norm2.bias": np.zeros(dd),
        "decoder_blocks.0.mlp.fc1.weight": r.normal(0, 0.05, (4 * dd, dd)),
        "decoder_blocks.0.mlp.fc1.bias": np.zeros(4 * dd),
        "decoder_blocks.0.mlp.fc2.weight": r.normal(0, 0.05, (dd, 4 * dd)),
        "decoder_blocks.0.mlp.fc2.bias": np.zeros(dd),
    }
    return {prefix + k: v.astype(np.float32) for k, v in s.items()}


def make_mae_state(rng, img=IMG):
    """Reference-named full MAE state dict: encoder.vit.* + encoder.mask_token
    + decoder.* (the torch.save(model.state_dict()) layout)."""
    enc = {"encoder.vit." + k: v
           for k, v in make_timm_state(rng + 1, img=img).items()}
    enc["encoder.mask_token"] = np.zeros((1, 1, D), np.float32)
    return {**enc, **make_decoder_state(rng, img=img)}


def torch_vit_forward_features(state, x_nchw):
    """Independent torch implementation of the timm forward_features contract
    (single source: scripts/evaluation/parity_check.py's golden)."""
    return _pc.torch_forward_features(state, x_nchw, DEPTH, HEADS, P)


def torch_mae_forward(state, x_nchw, idx_keep, idx_mask, *, depth=DEPTH,
                      heads=HEADS, dec_depth=1, dec_heads=4, patch=P):
    """Golden FULL MAE forward (single source: parity_check.py) with this
    module's tiny-model defaults."""
    return _pc.torch_mae_forward(
        state, x_nchw, idx_keep, idx_mask, depth=depth, heads=heads,
        dec_depth=dec_depth, dec_heads=dec_heads, patch=patch,
    )


class TestConverter:
    def test_forward_parity_with_torch_golden(self):
        state = make_timm_state(0)
        params, report = ti.timm_vit_to_params(state, DEPTH)
        assert not report["missing"] and not report["unexpected"], report
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32, attn_impl="xla")
        x = np.random.default_rng(1).normal(0, 1, (2, 3, IMG, IMG)).astype(np.float32)
        golden = torch_vit_forward_features(state, x)
        ours = vit.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-4)

    def test_mae_decoder_parity_with_torch_golden(self):
        """Full (pred, target) MAE pipeline — converted reference-named
        weights through OUR flax model vs the independent torch golden. This
        is the decoder-numerics link the round-2 parity chain lacked
        (encoder/classifier were golden-tested; the decoder was only
        round-tripped on names/shapes)."""
        state = make_mae_state(21)
        params, report = ti.mae_state_to_params(state, DEPTH, 1)
        assert not report["missing"], report["missing"]
        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32, attn_impl="xla")
        from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask

        idx_keep, idx_mask = random_token_mask(jax.random.PRNGKey(5), 3, 17, 12)
        x = np.random.default_rng(22).normal(0, 1, (3, 3, IMG, IMG)).astype(
            np.float32)
        pred, target = mae.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
            idx_keep, idx_mask,
        )
        g_pred, g_target = torch_mae_forward(
            state, x, np.asarray(idx_keep), np.asarray(idx_mask)
        )
        # targets are pure relayout+gather: bitwise
        np.testing.assert_array_equal(np.asarray(target), g_target)
        np.testing.assert_allclose(np.asarray(pred), g_pred, atol=5e-4)

    def test_vit_prefix_accepted(self):
        state = make_timm_state(0, prefix="vit.")
        params, report = ti.timm_vit_to_params(state, DEPTH)
        assert not report["missing"], report["missing"]

    def test_export_roundtrip(self, rng):
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32)
        params = vit.init(rng, jnp.zeros((1, IMG, IMG, 3)))["params"]
        state = ti.vit_params_to_timm_state(jax.device_get(params))
        back, report = ti.timm_vit_to_params(state, DEPTH)
        assert not report["missing"] and not report["unexpected"], report
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6),
            params, back,
        )

    def test_prefix_detection(self):
        keys = ["model.encoder.vit.cls_token", "model.decoder.mask_token"]
        assert ti.detect_prefix(keys) == "model.encoder."
        assert ti.detect_prefix(["encoder.cls_token"]) == "encoder."
        assert ti.detect_prefix(["module.encoder.x"]) == "module.encoder."
        assert ti.detect_prefix(["foo.bar"]) is None


class TestCheckpointRouting:
    def test_torch_file_loading_via_every_prefix(self, tmp_path, rng):
        """encoder_params_from_checkpoint over real torch files with each of
        the reference's three prefixes (train_mae.py:104-124)."""
        state = make_timm_state(3, prefix="vit.")
        for prefix in ["model.encoder.", "encoder.", "module.encoder."]:
            path = tmp_path / f"{prefix.replace('.', '_')}.pt"
            torch.save(
                {prefix + k: torch.from_numpy(v) for k, v in state.items()},
                path,
            )
            assert is_torch_checkpoint(path)
            params, report = encoder_params_from_checkpoint(path, DEPTH)
            assert not report["missing"], (prefix, report["missing"])
            np.testing.assert_allclose(
                np.asarray(params["cls_token"]), state["vit.cls_token"]
            )

    def test_lightning_style_state_dict_key(self, tmp_path):
        inner = {
            "model.encoder.vit." + k: torch.from_numpy(v)
            for k, v in make_timm_state(4).items()
        }
        torch.save({"state_dict": inner, "epoch": 7}, tmp_path / "l.ckpt")
        params, report = encoder_params_from_checkpoint(tmp_path / "l.ckpt", DEPTH)
        assert not report["missing"]

    def test_native_checkpoint_roundtrip_and_detection(self, tmp_path, rng):
        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask

        idx_keep, idx_mask = random_token_mask(rng, 1, 17, 12)
        params = mae.init(rng, jnp.zeros((1, IMG, IMG, 3)), idx_keep, idx_mask)[
            "params"
        ]
        p = tmp_path / "best.ckpt"
        save_checkpoint(p, {"params": params}, {"epoch": 3})
        assert is_native_checkpoint(p)
        assert not is_torch_checkpoint(p)
        loaded, meta = load_checkpoint(p)
        assert meta["epoch"] == 3
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            jax.device_get(params), loaded["params"],
        )
        enc, _ = encoder_params_from_checkpoint(p, DEPTH)
        assert "cls_token" in enc
        full, _ = mae_params_from_checkpoint(p, DEPTH, 1)
        assert "decoder" in full

    def test_classifier_from_torch_state(self, tmp_path):
        state = {"model.encoder." + k: v for k, v in make_timm_state(5).items()}
        state["model.head.classification.weight"] = np.random.default_rng(6).normal(
            0, 0.02, (10, D)
        ).astype(np.float32)
        state["model.head.classification.bias"] = np.zeros(10, np.float32)
        torch.save({k: torch.from_numpy(v) for k, v in state.items()},
                   tmp_path / "c.pt")
        params, report, _ = classifier_params_from_checkpoint(tmp_path / "c.pt", DEPTH)
        assert not report["missing"], report["missing"]
        clf = classifier_from_config(MODEL_CFG, dtype=jnp.float32)
        x = jnp.zeros((2, IMG, IMG, 3))
        logits = clf.apply({"params": params}, x)
        assert logits.shape == (2, 10)

    def test_mae_state_from_torch(self, tmp_path):
        """Full MAE state dict with encoder.vit.* + decoder.* keys."""
        state = make_mae_state(7)
        torch.save({k: torch.from_numpy(v) for k, v in state.items()},
                   tmp_path / "vit-mae.pt")
        params, report = mae_params_from_checkpoint(tmp_path / "vit-mae.pt", DEPTH, 1)
        assert not report["missing"], report["missing"]
        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask

        idx_keep, idx_mask = random_token_mask(jax.random.PRNGKey(0), 2, 17, 12)
        r = np.random.default_rng(7)
        x = jnp.asarray(r.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32))
        pred, target = mae.apply({"params": params}, x, idx_keep, idx_mask)
        assert pred.shape == (2, 12, P * P * 3)


class TestTorchExport:
    """Two-way interop: native params → reference-named torch state dicts."""

    def test_mae_roundtrip_torch_native_torch(self):
        """torch → native → torch is bitwise on every name and value (the
        encoder-level mask_token excepted: unused by the MAE forward, it is
        not represented natively and exports as zeros)."""
        original = make_mae_state(11)
        params, report = ti.mae_state_to_params(original, DEPTH, 1)
        assert not report["missing"], report["missing"]
        exported = ti.mae_params_to_state(params)
        assert set(exported) == set(original)
        for k in original:
            if k == "encoder.mask_token":
                continue
            np.testing.assert_array_equal(exported[k], original[k], err_msg=k)

    def test_classifier_roundtrip(self):
        state = {"encoder." + k: v for k, v in make_timm_state(12).items()}
        r = np.random.default_rng(13)
        state["head.classification.weight"] = r.normal(0, 0.02, (10, D)).astype(
            np.float32)
        state["head.classification.bias"] = np.zeros(10, np.float32)
        params, report = ti.classifier_state_to_params(state, DEPTH)
        assert not report["missing"], report["missing"]
        exported = ti.classifier_params_to_state(params)
        assert set(exported) == set(state)
        for k in state:
            np.testing.assert_array_equal(exported[k], state[k], err_msg=k)

    def test_convert_to_torch_cli_plain_torch_load(self, tmp_path, rng):
        """A natively-trained MAE checkpoint converts to a vit-mae.pt that a
        plain torch stack loads, and the exported encoder reproduces the flax
        forward through the independent torch golden."""
        from scripts.weight_utils.convert_to_torch import convert
        from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask

        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        idx_keep, idx_mask = random_token_mask(rng, 1, 17, 12)
        params = mae.init(rng, jnp.zeros((1, IMG, IMG, 3)), idx_keep, idx_mask)[
            "params"]
        native = tmp_path / "best.ckpt"
        save_checkpoint(native, {"params": params}, {"epoch": 1})

        out = tmp_path / "vit-mae.pt"
        kind = convert(native, out)
        assert kind == "mae"

        loaded = torch.load(out, map_location="cpu", weights_only=True)
        assert all(isinstance(v, torch.Tensor) for v in loaded.values())
        assert {k for k in loaded if k.startswith("decoder.")}, "no decoder keys"

        enc_state = {k[len("encoder.vit."):]: v.numpy() for k, v in loaded.items()
                     if k.startswith("encoder.vit.")}
        x = np.random.default_rng(2).normal(0, 1, (2, 3, IMG, IMG)).astype(
            np.float32)
        golden = torch_vit_forward_features(enc_state, x)
        vit = vit_from_config(MODEL_CFG, dtype=jnp.float32, attn_impl="xla")
        ours = vit.apply({"params": jax.device_get(params)["encoder"]},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-4)

    def test_extract_weights_outputs_torch_readable(self, tmp_path, rng):
        """extract_weights writes torch-readable .pt for native AND torch
        inputs (the reference's assets/weights contract)."""
        from scripts.weight_utils.extract_weights import extract
        from ssrl_vit_mae_jepa_tpu.ops.masking import random_token_mask

        mae = mae_from_config(MODEL_CFG, dtype=jnp.float32)
        idx_keep, idx_mask = random_token_mask(rng, 1, 17, 12)
        params = mae.init(rng, jnp.zeros((1, IMG, IMG, 3)), idx_keep, idx_mask)[
            "params"]
        native = tmp_path / "native.ckpt"
        save_checkpoint(native, {"params": params, "opt_state": {"x": 1}}, {})
        extract(native, tmp_path / "native.pt")
        out = torch.load(tmp_path / "native.pt", map_location="cpu",
                         weights_only=True)
        assert "encoder.vit.cls_token" in out and "opt_state" not in out

        wrapped = {"state_dict": {"model.encoder.vit.cls_token":
                                  torch.zeros(1, 1, D)}, "epoch": 3}
        torch.save(wrapped, tmp_path / "wrapped.ckpt")
        extract(tmp_path / "wrapped.ckpt", tmp_path / "wrapped.pt")
        out = torch.load(tmp_path / "wrapped.pt", map_location="cpu",
                         weights_only=True)
        assert set(out) == {"model.encoder.vit.cls_token"}

    def test_convert_to_torch_cli_classifier_and_encoder_kinds(self, tmp_path, rng):
        from scripts.weight_utils.convert_to_torch import convert

        clf = classifier_from_config(MODEL_CFG, dtype=jnp.float32)
        params = clf.init(rng, jnp.zeros((1, IMG, IMG, 3)))["params"]
        native = tmp_path / "clf.ckpt"
        save_checkpoint(native, {"params": params}, {})
        assert convert(native, tmp_path / "clf.pt") == "classifier"
        loaded = torch.load(tmp_path / "clf.pt", map_location="cpu",
                            weights_only=True)
        assert "head.classification.weight" in loaded
        assert loaded["head.classification.weight"].shape == (10, D)

        assert convert(native, tmp_path / "enc.pt", kind="encoder") == "encoder"
        enc = torch.load(tmp_path / "enc.pt", map_location="cpu", weights_only=True)
        assert "cls_token" in enc and "blocks.0.attn.qkv.weight" in enc
