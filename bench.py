"""MAE-pretrain throughput benchmark (the BASELINE.md headline metric).

Measures images/sec of the full jitted MAE training step — on-device uint8
augmentation → per-sample masking → masked-encoder/decoder fwd+bwd → clipped
AdamW update — on the flagship config (tiny ViT enc 144/4/6, dec 192/2/6,
96px/patch-8, mask 0.75, bf16 compute) on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's notebook trace ≈ 11.9k images/s on its CUDA GPU
(BASELINE.md: 23.2 it/s × batch 512, notebook.ipynb cell 18).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_IMAGES_PER_S = 11900.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--task", type=str, default="mae", choices=["mae", "jepa", "classifier"],
        help="which training step to benchmark (headline metric: mae)",
    )
    parser.add_argument("--batch-size", type=int, default=768)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument(
        "--fused", action=argparse.BooleanOptionalAction, default=False,
        help="time all --steps inside ONE jitted lax.fori_loop dispatch "
        "(steady-state device rate; removes per-dispatch relay latency)",
    )
    parser.add_argument("--attn-impl", type=str, default="auto")
    parser.add_argument("--augment", action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument(
        "--profile-dir", type=str, default=None,
        help="capture a jax.profiler trace of the timed steps into this dir",
    )
    parser.add_argument(
        "--tiny", action="store_true",
        help="shrink the model for smoke testing (CI import/arg regression "
        "checks on slow hosts) — NOT a performance configuration",
    )
    args = parser.parse_args()

    import jax

    # Honor a JAX_PLATFORMS=cpu override: the axon sitecustomize re-pins the
    # platform config at interpreter start, so the env var alone is inert —
    # without this the "CPU" bench smoke silently dials the TPU tunnel
    # (flaky 420 s subprocess timeouts whenever the relay is slow or down).
    from scripts.utils import setup_reproducibility

    setup_reproducibility()

    from ssrl_vit_mae_jepa_tpu.config import DEFAULTS
    from ssrl_vit_mae_jepa_tpu.parallel.mesh import get_mesh
    from ssrl_vit_mae_jepa_tpu.training.jepa_task import JEPATask
    from ssrl_vit_mae_jepa_tpu.training.tasks import ClassifierTask, MAETask
    from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

    B = args.batch_size
    mesh = get_mesh()
    model_cfg = DEFAULTS["model"]
    jepa_base = DEFAULTS["jepa"]
    if args.tiny:
        model_cfg = {
            "general": {"image_size": 96, "patch_size": 8, "in_chans": 3},
            "encoder": {"embed_dim": 32, "depth": 2, "num_heads": 4},
            "decoder": {"decoder_embed_dim": 32, "decoder_depth": 1,
                        "decoder_num_heads": 4},
            "head": {"pool": "cls"},
        }
        jepa_base = {**jepa_base, "predictor_embed_dim": 32,
                     "predictor_depth": 1, "predictor_num_heads": 4}
    pre_cfg = {
        "mask_ratio_start": 0.75, "mask_ratio_end": 0.75, "mask_ramp_epochs": 5,
        "total_epochs": 800, "warmup_epochs": 20, "batch_size": B,
        "base_learning_rate": 1.5e-4, "weight_decay": 0.05,
        "augment": args.augment,
    }
    if args.task == "mae":
        task = MAETask(model_cfg, pre_cfg, attn_impl=args.attn_impl)
    elif args.task == "jepa":
        jepa_cfg = {**jepa_base, "batch_size": B, "augment": args.augment}
        task = JEPATask(model_cfg, jepa_cfg, attn_impl=args.attn_impl)
    else:
        train_cfg = {**DEFAULTS["train"], "batch_size": B, "freeze_encoder": False}
        task = ClassifierTask(
            model_cfg, train_cfg, attn_impl=args.attn_impl,
            augment=args.augment,
        )
    trainer = Trainer(
        task, max_epochs=1, output_dir="/tmp/ssrl_bench", mesh=mesh,
        enable_checkpointing=False,
    )
    trainer.init_state()

    rng = np.random.default_rng(0)
    shardings = trainer._batch_shardings()
    batch = {
        "image": jax.device_put(
            rng.integers(0, 256, (B, 96, 96, 3)).astype(np.uint8),
            shardings["image"],
        ),
        "label": jax.device_put(
            rng.integers(0, 10, B).astype(np.int32), shardings["label"]
        ),
        "weight": jax.device_put(np.ones((B,), np.float32), shardings["weight"]),
    }
    ctx = task.epoch_context(0)
    state = trainer.state

    # NOTE: completion barrier is a VALUE FETCH, not jax.block_until_ready —
    # on the axon remote backend block_until_ready can return while the
    # dispatched chain is still executing server-side (measured: 1.3 ms/step
    # "with" block_until_ready vs 400 ms/step real); fetching a scalar from
    # the final step forces the whole dependency chain.
    for _ in range(args.warmup):
        state, sums = task.train_step(state, batch, 0, ctx)
    float(sums["loss_sum"])
    if args.fused:
        # compile + warm the fused loop outside the timed region
        state, sums = task.train_steps_fused(state, batch, 0, ctx, args.steps)
        float(sums["loss_sum"])

    from ssrl_vit_mae_jepa_tpu.utils.profiling import trace

    t0 = time.perf_counter()
    with trace(args.profile_dir):
        if args.fused:
            state, sums = task.train_steps_fused(state, batch, 0, ctx, args.steps)
        else:
            for _ in range(args.steps):
                state, sums = task.train_step(state, batch, 0, ctx)
        float(sums["loss_sum"])
    dt = time.perf_counter() - t0

    images_per_s = B * args.steps / dt
    n_chips = jax.device_count()

    # MFU + device time (VERDICT r3 #6): analytic dense-matmul FLOPs from
    # the task's static shapes (utils/flops.py documents the convention)
    # against the chip's bf16 peak; device_step_ms is the profiler
    # device-plane module-time sum when --profile-dir was given.
    from ssrl_vit_mae_jepa_tpu.utils.flops import (
        device_step_ms_from_trace,
        peak_flops_per_chip,
        task_flops_per_image,
    )

    flops_per_image = task_flops_per_image(task, ctx)
    peak = peak_flops_per_chip(jax.devices()[0].device_kind)
    mfu = (
        round(flops_per_image * images_per_s / (n_chips * peak), 4)
        if peak else None
    )
    device_step_ms = (
        device_step_ms_from_trace(args.profile_dir, args.steps)
        if args.profile_dir else None
    )
    result = {
        "metric": f"{args.task}_pretrain_images_per_sec"
        if args.task != "classifier" else "classifier_train_images_per_sec",
        "value": round(images_per_s, 1),
        "unit": "images/s",
        # the published reference baseline exists only for MAE pretraining;
        # for jepa/classifier the ratio is still against that MAE number —
        # a deliberate cross-task reference point (docs/PERFORMANCE.md
        # labels it as such), NOT a same-task comparison
        "vs_baseline": round(images_per_s / BASELINE_IMAGES_PER_S, 3),
        "batch_size": B,
        "steps": args.steps,
        "dispatch": "fused" if args.fused else "per-step",
        "chips": n_chips,
        "images_per_sec_per_chip": round(images_per_s / n_chips, 1),
        "step_time_ms": round(1e3 * dt / args.steps, 3),
        "platform": jax.devices()[0].platform,
        "flops_per_image": flops_per_image,
        "peak_tflops": round(peak / 1e12, 1) if peak else None,
        "mfu": mfu,
        "device_step_ms": (
            round(device_step_ms, 3) if device_step_ms else None
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
