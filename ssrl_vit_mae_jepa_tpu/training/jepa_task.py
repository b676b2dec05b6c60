"""JEPA pretraining task: EMA target encoder + latent predictor.

BASELINE.json config 4 — absent from the reference code (SURVEY.md §0).
Reuses the MAE pretraining conventions where sensible: AdamW with linear LR
scaling lr·batch/256, warmup×cosine epoch schedule, grad clip 1.0, monitor
``val_loss``/min. The target encoder's parameters live in
``TrainState.extra`` and are updated after every optimizer step with a
per-STEP-annealed EMA momentum (I-JEPA's schedule; the trainer supplies the
epoch length through ``on_fit_start``); stop-gradient guarantees no backward
flow. Context sampling is either the fixed-count complement sample or
I-JEPA's contiguous context block minus targets (``jepa.context_sampling``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.models.jepa import jepa_from_config
from ssrl_vit_mae_jepa_tpu.ops.jepa_masking import sample_jepa_masks
from ssrl_vit_mae_jepa_tpu.training.schedules import (
    effective_pretrain_lr,
    ema_momentum_at_step,
)
from ssrl_vit_mae_jepa_tpu.training.state import TrainState
from ssrl_vit_mae_jepa_tpu.training.tasks import Task, _weighted


class JEPATask(Task):
    monitor = "val_loss"
    monitor_mode = "min"

    def __init__(
        self,
        model_cfg: dict,
        jepa_cfg: dict,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        augment: Optional[bool] = None,
    ):
        super().__init__()
        self.model_cfg = model_cfg
        self.jepa_cfg = jepa_cfg
        self.model = jepa_from_config(
            model_cfg, jepa_cfg, dtype=dtype, attn_impl=attn_impl
        )
        base = float(jepa_cfg.get("base_learning_rate", 1.5e-4))
        self.batch_size = int(jepa_cfg.get("batch_size", 512))
        self.base_lr = effective_pretrain_lr(base, self.batch_size)
        self.weight_decay = float(jepa_cfg.get("weight_decay", 0.05))
        self.warmup_epochs = int(jepa_cfg.get("warmup_epochs", 20))
        self.total_epochs = int(jepa_cfg.get("total_epochs", 200))
        self.grad_clip = 1.0
        self.augment = bool(jepa_cfg.get("augment", True)) if augment is None else augment
        self.ema_start = float(jepa_cfg.get("ema_start", 0.996))
        self.ema_end = float(jepa_cfg.get("ema_end", 1.0))
        # per-step EMA annealing (I-JEPA); the trainer provides the epoch
        # length via on_fit_start. Until then post_update falls back to the
        # per-epoch approximation (standalone/test use of train_step).
        self.total_steps: Optional[int] = None
        self.steps_per_epoch: Optional[int] = None

        self.image_size = self.model.image_size
        self.grid_size = self.image_size // self.model.patch_size
        self.num_patches = self.model.num_patches
        self.num_blocks = int(jepa_cfg.get("num_target_blocks", 4))
        scale = jepa_cfg.get("target_scale", [0.15, 0.2])
        self.block_area = max(4, round(sum(scale) / 2 * self.num_patches))
        aspect = jepa_cfg.get("target_aspect_ratio", [0.75, 1.5])
        self.aspect_range = (float(aspect[0]), float(aspect[1]))
        # context: fixed-count sample, complement or contiguous-block minus
        # targets (see ops.jepa_masking)
        self.context_size = max(
            8, self.num_patches - self.num_blocks * self.block_area
        )
        self.context_sampling = str(jepa_cfg.get("context_sampling", "complement"))
        cscale = jepa_cfg.get("context_scale", [0.85, 1.0])
        self.context_scale = (float(cscale[0]), float(cscale[1]))
        # Round-5 lever switch: latent MSE via dense prediction + one-hot
        # weights instead of target-row gathers (numerics identical; see
        # JEPA.predict_dense). SSRL_JEPA_DENSE_LOSS=0 restores gathers.
        self.dense_loss = os.environ.get("SSRL_JEPA_DENSE_LOSS", "0") == "1"

    def init_params(self, rng):
        dummy = jnp.zeros((2, self.image_size, self.image_size, self.model.in_chans))
        t_idx, c_idx = sample_jepa_masks(
            rng, 2, self.grid_size, self.num_blocks, self.block_area,
            self.context_size, self.aspect_range,
            context_sampling=self.context_sampling,
            context_scale=self.context_scale,
        )
        idx_ctx = self._ctx_tokens(c_idx)
        idx_tgt = t_idx + 1
        return jax.jit(self.model.init)(rng, dummy, idx_ctx, idx_tgt)["params"]

    def init_extra(self, params):
        """EMA target-encoder params start as a copy of the context encoder."""
        return jax.tree.map(jnp.array, params["encoder"])

    @staticmethod
    def _ctx_tokens(ctx_patch_idx):
        """Patch-space context indices → token space with CLS pinned first."""
        B = ctx_patch_idx.shape[0]
        cls = jnp.zeros((B, 1), ctx_patch_idx.dtype)
        return jnp.concatenate([cls, ctx_patch_idx + 1], axis=1)

    def loss_and_metric_sums(self, params, images, batch, rng, ctx, extra=None):
        B = images.shape[0]
        t_idx, c_idx = self._draw_sliced(
            lambda r, b: sample_jepa_masks(
                r, b, self.grid_size, self.num_blocks, self.block_area,
                self.context_size, self.aspect_range,
                context_sampling=self.context_sampling,
                context_scale=self.context_scale,
            ),
            rng, B,
        )
        idx_ctx = self._ctx_tokens(c_idx)
        idx_tgt = t_idx + 1
        w = batch["weight"]
        T = idx_tgt.shape[1]
        if self.dense_loss:
            # Dense-loss formulation (round-5 lever): predict/encode every
            # token, weight the latent MSE by a one-hot target mask —
            # identical loss/grads to the gathered path (zero cotangent at
            # non-target rows), minus both gather matmuls, the predictor
            # backward scatter, and their relayout copies.
            pred = self.model.apply(
                {"params": params}, images, idx_ctx,
                method=self.model.predict_dense,
            )
            target = self.model.apply(
                {"params": {"encoder": extra}}, images,
                method=self.model.target_representations_dense,
            )
            target = jax.lax.stop_gradient(target)
            predf = pred.astype(jnp.float32)
            targf = target.astype(jnp.float32)
            # (B, L) occupancy of idx_tgt in token space; the one-hot sum
            # reproduces gather semantics exactly — incl. the double count
            # when I-JEPA target blocks overlap on a patch.
            mask = jax.nn.one_hot(
                idx_tgt, self.model.sequence_length, dtype=jnp.float32
            ).sum(axis=1)
            diff = predf - targf
            per_ex = jnp.sum(
                diff * diff * mask[:, :, None], axis=(1, 2)
            ) / (T * predf.shape[-1])
        else:
            pred = self.model.apply({"params": params}, images, idx_ctx, idx_tgt)
            target = self.model.apply(
                {"params": {"encoder": extra}},
                images,
                idx_tgt,
                method=self.model.target_representations,
            )
            target = jax.lax.stop_gradient(target)
            predf = pred.astype(jnp.float32)
            targf = target.astype(jnp.float32)
            mask = None
            per_ex = jnp.mean((predf - targf) ** 2, axis=(1, 2))
        loss_sum, weight_sum = _weighted(per_ex, w)
        loss = loss_sum / self._loss_den(weight_sum)
        sums = {"loss_sum": loss_sum, "weight_sum": weight_sum}
        sums.update(self._collapse_sums(predf, targf, w, weight_sum, mask=mask))
        return loss, sums

    def _collapse_sums(self, predf, targf, w, weight_sum, mask=None):
        """Per-batch collapse diagnostics, accumulated as weighted sums.

        A joint-embedding method can drive latent MSE down by collapsing both
        towers to a constant — a near-flat loss curve is indistinguishable
        from learning without these. Logged per epoch via
        ``epoch_metrics_from_sums``:

        - ``pred_std`` / ``target_std``: mean-over-dims std of the
          (B·M, D) predictor outputs / EMA-target representations across the
          batch (→ 0 under collapse; stays O(1) when representations vary),
        - ``pred_target_cos``: mean row-wise cosine(pred, target) — high
          cosine WITH near-zero std is the collapse signature; high cosine
          with healthy std is genuine prediction.

        DP-invariance: the std is computed from GLOBALLY psum-ed per-dim
        (count, Σx, Σx²) moments — a psum of per-shard stds would drop the
        between-shard variance term (law of total variance) and read
        systematically low on a data mesh, false-alarming collapse.
        """

        def _gsum(x):
            # global-batch moment (the step-end psum touches only the
            # returned *_sum leaves, which scale by the LOCAL weight_sum —
            # so the std itself must already be the global value here)
            if self._axis is None:
                return x
            return jax.lax.psum(x, self._axis)

        def _wstd(x, row_w):
            # weighted std over ALL (global-batch) rows per dim, averaged
            # over dims — from psum-ed raw moments
            tot = jnp.maximum(_gsum(jnp.sum(row_w)), 1e-9)
            s1 = _gsum(jnp.sum(x * row_w[:, None], axis=0))
            s2 = _gsum(jnp.sum(x * x * row_w[:, None], axis=0))
            mu = s1 / tot
            var = s2 / tot - mu * mu
            return jnp.mean(jnp.sqrt(jnp.maximum(var, 0.0)))

        Bc, M, D = predf.shape
        if mask is None:
            rows_w = jnp.repeat(w, M)
        else:
            # dense-loss path: rows are ALL tokens; weight = example weight
            # × target-occupancy (0 at non-target rows, >1 on block overlap
            # — exactly the gathered row multiset)
            rows_w = (mask * w[:, None]).reshape(-1)
        p2 = predf.reshape(Bc * M, D)
        t2 = targf.reshape(Bc * M, D)
        pred_std = _wstd(p2, rows_w)
        targ_std = _wstd(t2, rows_w)
        dot = jnp.sum(p2 * t2, axis=-1)
        norm = jnp.linalg.norm(p2, axis=-1) * jnp.linalg.norm(t2, axis=-1)
        cos = jnp.sum((dot / jnp.maximum(norm, 1e-9)) * rows_w) / jnp.maximum(
            jnp.sum(rows_w), 1e-9
        )
        return {
            "pred_std_sum": pred_std * weight_sum,
            "target_std_sum": targ_std * weight_sum,
            "cos_sum": cos * weight_sum,
        }

    def loss_and_metric_sums_in_step(self, params, state, images, batch, rng, ctx):
        loss, sums = self.loss_and_metric_sums(
            params, images, batch, rng, ctx, extra=state.extra
        )
        # EMA drift: relative L2 distance between the context encoder and its
        # EMA target. ≈0 with a flat loss means the target tracks the online
        # encoder so closely the prediction task is trivial (or training has
        # stalled); it should stay small but nonzero while learning.
        diff_sq = sum(
            jnp.sum((p.astype(jnp.float32) - t.astype(jnp.float32)) ** 2)
            for p, t in zip(
                jax.tree.leaves(params["encoder"]), jax.tree.leaves(state.extra)
            )
        )
        ref_sq = sum(
            jnp.sum(t.astype(jnp.float32) ** 2)
            for t in jax.tree.leaves(state.extra)
        )
        drift = jnp.sqrt(diff_sq / jnp.maximum(ref_sq, 1e-12))
        sums["ema_drift_sum"] = jax.lax.stop_gradient(drift) * sums["weight_sum"]
        return loss, sums

    def on_fit_start(self, steps_per_epoch: int) -> None:
        self.steps_per_epoch = steps_per_epoch
        self.total_steps = steps_per_epoch * self.total_epochs
        self._train_step = None  # re-trace with the step count baked in
        self._fused_cache_key = None

    def _momentum(self, state: TrainState, epoch):
        if self.total_steps:
            # per-step anneal (I-JEPA); state.step is the global step counter
            return ema_momentum_at_step(
                state.step, self.total_steps, self.ema_start, self.ema_end
            )
        frac = jnp.clip(
            jnp.asarray(epoch, jnp.float32) / max(1, self.total_epochs), 0.0, 1.0
        )
        return self.ema_start + frac * (self.ema_end - self.ema_start)

    def post_update(self, state: TrainState, epoch) -> TrainState:
        m = self._momentum(state, epoch)
        new_ema = jax.tree.map(
            lambda t, p: t * m + p.astype(t.dtype) * (1.0 - m),
            state.extra,
            state.params["encoder"],
        )
        return state.replace(extra=new_ema)

    def host_epoch_metrics(self, epoch: int) -> Dict[str, float]:
        if self.total_steps and self.steps_per_epoch:
            m = float(ema_momentum_at_step(
                epoch * self.steps_per_epoch, self.total_steps,
                self.ema_start, self.ema_end,
            ))
        else:
            frac = min(epoch / max(1, self.total_epochs), 1.0)
            m = self.ema_start + frac * (self.ema_end - self.ema_start)
        return {"ema_momentum": m}

    @staticmethod
    def epoch_metrics_from_sums(sums: Dict[str, float], prefix: str) -> Dict[str, float]:
        w = max(sums.get("weight_sum", 0.0), 1e-9)
        out = {f"{prefix}_loss": sums.get("loss_sum", 0.0) / w}
        for key, name in (
            ("pred_std_sum", "pred_std"),
            ("target_std_sum", "target_std"),
            ("cos_sum", "pred_target_cos"),
            ("ema_drift_sum", "ema_drift"),
        ):
            if key in sums:
                out[f"{prefix}_{name}"] = sums[key] / w
        return out
