"""Parity against weights from a REAL torch optimization trajectory.

VERDICT r3 #5: every golden check previously ran on synthetic state dicts
authored by our own generators, so a converter bug that our generators and
converters share could hide. Here genuine ``torch.nn`` modules with the
reference layouts (timm-named ViT at ``encoder.vit.*``/``encoder.*``,
lightly-named decoder at ``decoder.*``, ``head.classification.*``;
reference ``scripts/training/pretrain_mae.py:133-134`` Lightning artifact
shape) are TRAINED for several Adam steps on their actual objectives, saved
via ``torch.save`` in the Lightning layout (``state_dict`` under ``model.``
plus ``callbacks``/``hyper_parameters``), and pushed through the full parity
protocol: converter → golden numeric check → probe re-evaluation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from scripts.evaluation.parity_check import check_file
from tests.test_interop import D, DEPTH, HEADS, IMG, MODEL_CFG, P

DD, DEC_DEPTH, DEC_HEADS = 40, 1, 4
N_PATCH = (IMG // P) ** 2


class _Attn(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)
        self.h = h

    def forward(self, x):
        B, L, Dm = x.shape
        hd = Dm // self.h
        qkv = self.qkv(x).reshape(B, L, 3, self.h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-2, -1) / hd**0.5, dim=-1)
        o = (att @ v).transpose(1, 2).reshape(B, L, Dm)
        return self.proj(o)


class _Mlp(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.fc1 = nn.Linear(d, 4 * d)
        self.fc2 = nn.Linear(4 * d, d)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = _Attn(d, h)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = _Mlp(d)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TimmViT(nn.Module):
    """state_dict keys match timm's ViT exactly (the converter contract)."""

    def __init__(self):
        super().__init__()
        g = torch.Generator().manual_seed(7)
        self.cls_token = nn.Parameter(
            0.02 * torch.randn(1, 1, D, generator=g))
        self.pos_embed = nn.Parameter(
            0.02 * torch.randn(1, N_PATCH + 1, D, generator=g))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, D, P, stride=P)
        self.blocks = nn.ModuleList([_Block(D, HEADS) for _ in range(DEPTH)])
        self.norm = nn.LayerNorm(D, eps=1e-6)

    def forward_features(self, x):
        B = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(B, -1, -1), t], 1) + self.pos_embed
        for b in self.blocks:
            t = b(t)
        return self.norm(t)


class _LightlyDecoder(nn.Module):
    """state_dict keys match lightly's MAEDecoderTIMM."""

    def __init__(self):
        super().__init__()
        g = torch.Generator().manual_seed(8)
        self.decoder_embed = nn.Linear(D, DD)
        self.mask_token = nn.Parameter(
            0.02 * torch.randn(1, 1, DD, generator=g))
        self.decoder_pos_embed = nn.Parameter(
            0.02 * torch.randn(1, N_PATCH + 1, DD, generator=g))
        self.decoder_blocks = nn.ModuleList(
            [_Block(DD, DEC_HEADS) for _ in range(DEC_DEPTH)])
        self.decoder_norm = nn.LayerNorm(DD, eps=1e-6)
        self.decoder_pred = nn.Linear(DD, P * P * 3)


class _TorchMAE(nn.Module):
    """Reference MAE layout: ``encoder.vit.*`` + ``encoder.mask_token`` +
    ``decoder.*`` (torch.save(model.state_dict()) contract)."""

    def __init__(self):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.vit = _TimmViT()
        self.encoder.mask_token = nn.Parameter(torch.zeros(1, 1, D))
        self.decoder = _LightlyDecoder()

    def forward(self, x, idx_keep, idx_mask):
        B = x.shape[0]
        vit = self.encoder.vit
        t = vit.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([vit.cls_token.expand(B, -1, -1), t], 1) + vit.pos_embed
        kept = torch.gather(t, 1, idx_keep[:, :, None].expand(-1, -1, D))
        for b in vit.blocks:
            kept = b(kept)
        kept = vit.norm(kept)
        dec = self.decoder
        emb = dec.decoder_embed(kept)
        seq = dec.mask_token.expand(B, N_PATCH + 1, DD).clone()
        seq = seq.scatter(1, idx_keep[:, :, None].expand(-1, -1, DD), emb)
        seq = seq + dec.decoder_pos_embed
        for b in dec.decoder_blocks:
            seq = b(seq)
        seq = dec.decoder_norm(seq)
        pred_tok = torch.gather(seq, 1, idx_mask[:, :, None].expand(-1, -1, DD))
        pred = dec.decoder_pred(pred_tok)
        # pixel targets: CHW-within-patch patchify at idx_mask - 1
        h = w = IMG // P
        patches = (
            x.reshape(B, 3, h, P, w, P)
            .permute(0, 2, 4, 1, 3, 5)
            .reshape(B, N_PATCH, 3 * P * P)
        )
        target = torch.gather(
            patches, 1,
            (idx_mask - 1).clamp(min=0)[:, :, None].expand(-1, -1, 3 * P * P),
        )
        return pred, target


def _mask_indices(rng, batch, n_mask=12):
    """CLS-pinned keep/mask index pairs (torch int64)."""
    L = N_PATCH + 1
    keeps, masks = [], []
    for _ in range(batch):
        perm = rng.permutation(np.arange(1, L))
        masks.append(perm[:n_mask])
        keeps.append(np.concatenate([[0], np.sort(perm[n_mask:])]))
    return (
        torch.from_numpy(np.stack(keeps)).long(),
        torch.from_numpy(np.stack(masks)).long(),
    )


def _lightning_save(module, path, epoch=5, score=0.123):
    torch.save(
        {
            "state_dict": {
                "model." + k: v for k, v in module.state_dict().items()
            },
            "epoch": epoch,
            "global_step": epoch * 4,
            "callbacks": {"best_model_score": score},
            "hyper_parameters": {"lr": 1e-3},
        },
        path,
    )


def test_trained_mae_checkpoint_passes_parity(tmp_path):
    torch.manual_seed(73)
    rng = np.random.default_rng(73)
    model = _TorchMAE()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.from_numpy(
        rng.normal(0, 1, (4, 3, IMG, IMG)).astype(np.float32))
    losses = []
    for _ in range(6):
        idx_keep, idx_mask = _mask_indices(rng, 4)
        pred, target = model(x, idx_keep, idx_mask)
        loss = ((pred - target) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses  # a genuine trajectory, not noise

    ckpt = tmp_path / "trained_mae.ckpt"
    _lightning_save(model, ckpt)
    cfg = {"model": MODEL_CFG}
    assert check_file(ckpt, cfg, batch=4, tol=2e-3)

    # and the flax encoder forward matches the trained torch module itself
    # (not just the parity golden) on fresh inputs
    from ssrl_vit_mae_jepa_tpu.models import vit_from_config
    from ssrl_vit_mae_jepa_tpu.utils.load import encoder_params_from_checkpoint

    params, _ = encoder_params_from_checkpoint(ckpt, DEPTH)
    vit = vit_from_config(MODEL_CFG, dtype=jnp.float32, attn_impl="xla")
    x2 = rng.normal(0, 1, (2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        golden = model.encoder.vit.forward_features(
            torch.from_numpy(x2)).numpy()
    ours = np.asarray(
        vit.apply({"params": params}, jnp.asarray(x2.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, golden, atol=2e-4)


class _TorchClassifier(nn.Module):
    """Reference classifier layout: ``encoder.*`` timm +
    ``head.classification.*``."""

    def __init__(self):
        super().__init__()
        self.encoder = _TimmViT()
        self.head = nn.Module()
        self.head.classification = nn.Linear(D, 10)

    def forward(self, x):
        feats = self.encoder.forward_features(x)
        return self.head.classification(feats[:, 0])


def test_trained_classifier_checkpoint_passes_parity(tmp_path):
    torch.manual_seed(21)
    rng = np.random.default_rng(21)
    model = _TorchClassifier()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.from_numpy(rng.normal(0, 1, (8, 3, IMG, IMG)).astype(np.float32))
    y = torch.from_numpy(rng.integers(0, 10, 8)).long()
    losses = []
    for _ in range(6):
        loss = torch.nn.functional.cross_entropy(model(x), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    ckpt = tmp_path / "trained_clf.ckpt"
    _lightning_save(model, ckpt, score=0.456)
    cfg = {"model": MODEL_CFG}
    assert check_file(ckpt, cfg, batch=4, tol=2e-3)

    # Lightning-artifact metadata survives our loaders (quirk: the val-acc
    # plot reads callbacks.best_model_score from torch ckpts)
    from ssrl_vit_mae_jepa_tpu.utils.checkpoint import is_torch_checkpoint

    assert is_torch_checkpoint(ckpt)


def test_parity_protocol_cli_on_trained_weights(tmp_path, synthetic_stl10_dir):
    """The one-command protocol end-to-end on TRAINED torch artifacts,
    including the probe re-evaluation path (head present) against the
    0.5-pt bar — ours and the torch golden run the same converted weights,
    so the delta is pure numerics and must be ~0."""
    import subprocess
    import sys
    from pathlib import Path

    import yaml

    torch.manual_seed(4)
    rng = np.random.default_rng(4)
    model = _TorchClassifier()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.from_numpy(rng.normal(0, 1, (8, 3, IMG, IMG)).astype(np.float32))
    y = torch.from_numpy(rng.integers(0, 10, 8)).long()
    for _ in range(4):
        loss = torch.nn.functional.cross_entropy(model(x), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
    wdir = tmp_path / "weights"
    wdir.mkdir()
    _lightning_save(model, wdir / "classifier.ckpt")

    cfg = {"model": MODEL_CFG, "test": {"batch_size": 25, "num_workers": 0}}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    repo = Path(__file__).resolve().parents[1]
    from tests.conftest import scrubbed_cpu_env

    # scrub the suite's 8-virtual-device XLA_FLAGS: batch 25 deliberately
    # exercises the padded final batch (40 → 25 + 15 pad) and doesn't
    # divide across a forced multi-device mesh
    env = scrubbed_cpu_env()
    out = subprocess.run(
        [sys.executable, "-m", "scripts.evaluation.run_parity_protocol",
         str(wdir), "--config", str(cfg_path),
         "--data-dir", str(synthetic_stl10_dir), "--batch", "4",
         "--tol", "2e-3"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "PARITY OK" in out.stdout
