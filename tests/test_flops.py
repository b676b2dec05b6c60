"""Analytic FLOPs / MFU accounting (utils/flops.py, VERDICT r3 #6)."""

import numpy as np

from ssrl_vit_mae_jepa_tpu.config import DEFAULTS
from ssrl_vit_mae_jepa_tpu.training.jepa_task import JEPATask
from ssrl_vit_mae_jepa_tpu.training.tasks import ClassifierTask, MAETask
from ssrl_vit_mae_jepa_tpu.utils.flops import (
    block_flops,
    device_step_ms_from_trace,
    peak_flops_per_chip,
    task_flops_per_image,
)

MODEL = DEFAULTS["model"]
PRE = {**DEFAULTS["pretrain"], "batch_size": 64}


def test_block_flops_hand_formula():
    # L=37, D=144, hidden=576: qkv + 2 score matmuls + proj + 2 mlp matmuls
    L, D, H = 37, 144, 576
    expected = (
        2 * L * D * 3 * D + 4 * L * L * D + 2 * L * D * D
        + 2 * L * D * H + 2 * L * H * D
    )
    assert block_flops(L, D) == expected


def test_mae_flops_default_config():
    task = MAETask(MODEL, PRE)
    f = task_flops_per_image(task)
    # fwd+bwd = 3x fwd; components: embed(144 patches), enc(L=37, 4 blocks),
    # dec embed, dec(L=145, 2 blocks), pixel head on the 108 masked rows
    fwd = (
        2 * 144 * 192 * 144
        + 4 * block_flops(37, 144)
        + 2 * 37 * 144 * 192
        + 2 * block_flops(145, 192)
        + 2 * 108 * 192 * 192
    )
    assert f == 3 * fwd


def test_jepa_flops_formula():
    jepa = JEPATask(MODEL, {**DEFAULTS["jepa"], "batch_size": 64})
    # default geometry: ctx tokens 45 (44 patches + CLS), 100 target tokens,
    # predictor dim 96 over the full 145-token sequence, EMA tower fwd-only
    embed = 2 * 144 * 192 * 144
    ctx_fwd = (
        embed
        + 4 * block_flops(45, 144)
        + 2 * 45 * 144 * 96
        + 2 * block_flops(145, 96)
        + 2 * 100 * 96 * 144
    )
    target_fwd = embed + 4 * block_flops(145, 144)
    assert task_flops_per_image(jepa) == 3 * ctx_fwd + target_fwd


def test_classifier_frozen_cheaper():
    cfg = {**DEFAULTS["train"], "batch_size": 64}
    full = ClassifierTask(MODEL, {**cfg, "freeze_encoder": False})
    frozen = ClassifierTask(MODEL, {**cfg, "freeze_encoder": True})
    assert task_flops_per_image(frozen) < task_flops_per_image(full)
    # frozen = 1x encoder fwd (+ tiny head terms) ~ 1/3 of full
    ratio = task_flops_per_image(frozen) / task_flops_per_image(full)
    assert 0.30 < ratio < 0.40


def test_peak_flops_lookup(monkeypatch):
    monkeypatch.delenv("SSRL_PEAK_TFLOPS", raising=False)
    assert peak_flops_per_chip("TPU v5 lite") == 197e12
    assert peak_flops_per_chip("TPU v4") == 275e12
    assert peak_flops_per_chip("cpu") is None
    monkeypatch.setenv("SSRL_PEAK_TFLOPS", "100")
    assert peak_flops_per_chip("cpu") == 100e12


def test_device_step_ms_none_without_device_plane(tmp_path):
    # empty dir -> no xplane files -> None (and no crash)
    assert device_step_ms_from_trace(str(tmp_path), 3) is None


def test_device_step_ms_parses_cpu_trace(tmp_path):
    # a real trace without a TPU device plane parses cleanly to None
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    f(x).block_until_ready()
    with jax.profiler.trace(str(tmp_path)):
        float(f(x).sum())
    assert device_step_ms_from_trace(str(tmp_path), 1) is None
