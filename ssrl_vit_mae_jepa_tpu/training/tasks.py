"""Training tasks: the objective + optimizer + jitted step for each stage.

Replaces the reference's LightningModules (``MAEPretrainModule`` at
``src/training/mae.py:14``, ``ViTClassifierTrainModule`` at
``src/training/classifier.py:16``) with pure-functional tasks: every task
builds ONE jitted train step (augmentation → forward → loss → grads →
clipped AdamW update, all fused by XLA on device) and one jitted eval step.
Epoch-level hyperparameters (LR factor) are computed *inside* the jitted
step from a traced epoch scalar — no per-epoch recompilation; the MAE
mask-ratio ramp changes a **static** token count and re-specializes the step
once per distinct ratio (≤5 compiles for the reference ramp).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ssrl_vit_mae_jepa_tpu.models.classifier import classifier_from_config
from ssrl_vit_mae_jepa_tpu.models.mae import mae_from_config
from ssrl_vit_mae_jepa_tpu.ops.augment import (
    apply_augment,
    apply_augment_patches,
    draw_augment_params,
    eval_transform,
)
from ssrl_vit_mae_jepa_tpu.ops.masking import num_masked_tokens, random_token_mask
from ssrl_vit_mae_jepa_tpu.training.optim import (
    make_optimizer,
    set_learning_rate,
    stop_gradients_on_frozen,
    trainable_mask,
)
from ssrl_vit_mae_jepa_tpu.training.schedules import (
    effective_pretrain_lr,
    mask_ratio_at_epoch,
    warmup_cosine_factor,
)
from ssrl_vit_mae_jepa_tpu.training.state import TrainState


class Task:
    """Base: owns model, optimizer, freeze mask, and the jitted steps."""

    #: built by subclasses
    model = None

    def __init__(self):
        self.tx: Optional[optax.GradientTransformation] = None
        self.mask = None
        self._train_step = None
        self._eval_step = None
        self._fused_train_steps = None
        self._fused_cache_key = None
        #: set by Trainer (configure_sharding): data-parallel shard_map
        self._mesh = None
        self._axis = None

    # ---- data-parallel sharding -----------------------------------------
    def configure_sharding(self, mesh) -> None:
        """Run the jitted steps as ``jax.shard_map`` over the mesh's
        ``data`` axis (manual collectives; other axes stay automatic/GSPMD).

        GSPMD cannot partition a Pallas kernel — an opaque Mosaic custom
        call inside a plainly-jitted step makes XLA replicate the FULL
        global batch on every chip, destroying data-parallel scaling. Under
        shard_map each chip traces the step at its LOCAL batch shape (the
        hardware-validated single-chip kernel shapes), the loss is
        normalized by the GLOBAL weight sum (``_loss_den``), and gradients
        and metric sums are explicitly ``psum``-ed over the data axis
        (``check_vma=False`` — see the note in ``_make_train_step``). A
        1-device data axis is the identity, so single-chip runs take the
        same code path.
        """
        self._mesh = mesh
        self._axis = "data" if (mesh is not None and "data" in mesh.shape) else None
        self._train_step = None
        self._eval_step = None
        self._fused_cache_key = None

    def _manual_axes(self) -> frozenset:
        """Mesh axes the shard_map makes manual: ``data`` plus every size-1
        axis. A trivial (size-1) axis left automatic still puts the body
        under GSPMD partitioning, and Mosaic custom calls refuse to lower
        there ("Mosaic kernels cannot be automatically partitioned") — this
        crashed the default step on real TPU hardware, where the production
        mesh is {data: n, model: 1}. Only a genuinely >1 ``model`` axis
        stays automatic (tensor-parallel matmul partitioning, XLA attn
        path)."""
        names = {self._axis}
        for name, size in self._mesh.shape.items():
            if size == 1:
                names.add(name)
        return frozenset(names)

    def _draw_sliced(self, draw, rng, local_b: int):
        """Per-example random draws invariant to the data sharding.

        ``draw(rng, B)`` must return arrays with a leading batch dim whose
        rows are independent (augment params, mask indices). Under
        shard_map every shard draws at the GLOBAL batch size and slices its
        own rows, so DP over N chips consumes exactly the randomness a
        single-chip run would — the DP≡single-device equivalence tests
        rely on this.
        """
        if self._axis is None:
            return draw(rng, local_b)
        n = jax.lax.axis_size(self._axis)
        i = jax.lax.axis_index(self._axis)
        full = draw(rng, local_b * n)
        return jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, i * local_b, local_b, 0),
            full,
        )

    def _loss_den(self, weight_sum):
        """Weighted-mean denominator: the GLOBAL weight sum under sharding
        (per-shard normalization would bias the gradient when shards carry
        different padding)."""
        if self._axis is not None:
            weight_sum = jax.lax.psum(weight_sum, self._axis)
        return jnp.maximum(weight_sum, 1.0)

    def _psum_sums(self, sums):
        if self._axis is None:
            return sums
        return jax.tree.map(lambda s: jax.lax.psum(s, self._axis), sums)

    # ---- subclass hooks -------------------------------------------------
    def init_params(self, rng) -> Any:
        raise NotImplementedError

    def loss_and_metric_sums(
        self, params, images, batch, rng, ctx, extra=None
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    def loss_and_metric_sums_in_step(self, params, state, images, batch, rng, ctx):
        """In-step variant with access to the full state (e.g. EMA params)."""
        return self.loss_and_metric_sums(
            params, images, batch, rng, ctx, extra=state.extra
        )

    def eval_metric_sums(
        self, params, extra, images, batch, rng, ctx
    ) -> Dict[str, jnp.ndarray]:
        loss, sums = self.loss_and_metric_sums(
            params, images, batch, rng, ctx, extra=extra
        )
        return sums

    def lr_value(self, epoch):
        return self.base_lr * warmup_cosine_factor(
            epoch, self.warmup_epochs, self.total_epochs
        )

    def epoch_context(self, epoch: int):
        """Static (hashable) per-epoch context; changing it re-specializes."""
        return None

    def host_epoch_metrics(self, epoch: int) -> Dict[str, float]:
        return {}

    def preprocess_train(self, rng, images_u8):
        out = int(getattr(self, "image_size", images_u8.shape[1]))
        if getattr(self, "augment", True):
            u, flip = self._draw_sliced(
                draw_augment_params, rng, images_u8.shape[0]
            )
            p = getattr(getattr(self, "model", None), "patch_size", None)
            if p is not None and os.environ.get("SSRL_AUG_PATCHES", "1") == "1":
                # augment fused with patchify (round-5 lever, value-exact):
                # the models take the (B, N, p·p·C) tokens directly, so the
                # NHWC image tensor and its relayout copies never exist
                # (ops/augment.py::apply_augment_patches). =0 restores the
                # image-tensor path.
                return apply_augment_patches(
                    u, flip, images_u8, patch_size=int(p), out_size=out,
                    dtype=jnp.float32,
                )
            return apply_augment(u, flip, images_u8, out_size=out,
                                 dtype=jnp.float32)
        return eval_transform(images_u8, out_size=out, dtype=jnp.float32)

    def preprocess_eval(self, images_u8):
        out = int(getattr(self, "image_size", images_u8.shape[1]))
        return eval_transform(images_u8, out_size=out, dtype=jnp.float32)

    # ---- engine ----------------------------------------------------------
    def build_optimizer(self, params):
        self.tx = make_optimizer(
            learning_rate=self.base_lr,
            weight_decay=self.weight_decay,
            grad_clip=self.grad_clip,
            trainable_mask=self.mask,
        )
        return self.tx.init(params)

    def init_extra(self, params):
        """Task-specific non-trainable state (e.g. JEPA's EMA target params)."""
        return None

    def post_update(self, state: "TrainState", epoch) -> "TrainState":
        """Hook after the optimizer update, inside the jitted step."""
        return state

    def on_fit_start(self, steps_per_epoch: int) -> None:
        """Hook called by the trainer before the first step with the epoch
        length, for schedules that need the total step count (JEPA EMA)."""

    def init_state(self, rng, init_params_override=None) -> TrainState:
        params_rng, state_rng = jax.random.split(rng)
        params = self.init_params(params_rng)
        if init_params_override is not None:
            params = init_params_override(params)
        opt_state = self.build_optimizer(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            rng=state_rng,
            step=jnp.zeros((), jnp.int32),
            extra=self.init_extra(params),
        )

    def train_step(self, state: TrainState, batch, epoch, ctx=None):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        return self._train_step(state, batch, jnp.asarray(epoch, jnp.float32), ctx)

    def eval_step(self, params, batch, rng, ctx=None, extra=None):
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        return self._eval_step(params, extra, batch, rng, ctx)

    def train_steps_fused(self, state: TrainState, batch, epoch, ctx, n: int):
        """Run ``n`` identical-batch train steps inside ONE jitted dispatch.

        A ``lax.fori_loop`` over the same per-step body ``train_step``
        compiles (same RNG splitting, schedules, psums, post_update), so
        the math per step is identical — only the host↔device dispatch
        count changes (1 instead of ``n``). This is the steady-state
        measurement mode for the throughput bench: over the axon relay a
        per-step dispatch serializes ~1 ms of RPC latency into every step
        that a directly-attached TPU host would overlap with device
        execution (docs/PERFORMANCE.md round-5 section has the measured
        wall-vs-device gap). Not used by the Trainer epoch loop, which
        needs per-step metrics/batches.
        """
        key = ("fused", n)
        if getattr(self, "_fused_cache_key", None) != key:
            self._fused_train_steps = self._make_train_steps_fused(n)
            self._fused_cache_key = key
        return self._fused_train_steps(
            state, batch, jnp.asarray(epoch, jnp.float32), ctx
        )

    def _make_train_steps_fused(self, n: int):
        local_step = self._local_train_step()

        def local_loop(state, batch, epoch, ctx):
            st, sums = local_step(state, batch, epoch, ctx)
            st, sums = jax.lax.fori_loop(
                0, n - 1,
                lambda i, c: local_step(c[0], batch, epoch, ctx),
                (st, sums),
            )
            return st, sums

        if self._axis is None:
            return jax.jit(local_loop, static_argnums=(3,), donate_argnums=(0,))

        mesh = self._mesh
        P = jax.sharding.PartitionSpec

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def sharded_loop(state, batch, epoch, ctx):
            f = jax.shard_map(
                partial(local_loop, ctx=ctx),
                mesh=mesh,
                in_specs=(P(), P("data"), P()),
                out_specs=(P(), P()),
                axis_names=self._manual_axes(),
                check_vma=False,
            )
            return f(state, batch, epoch)

        return sharded_loop

    def _make_train_step(self):
        local_step = self._local_train_step()

        if self._axis is None:
            return jax.jit(local_step, static_argnums=(3,), donate_argnums=(0,))

        mesh = self._mesh
        P = jax.sharding.PartitionSpec

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def sharded_step(state, batch, epoch, ctx):
            f = jax.shard_map(
                partial(local_step, ctx=ctx),
                mesh=mesh,
                in_specs=(P(), P("data"), P()),
                out_specs=(P(), P()),
                axis_names=self._manual_axes(),
                check_vma=False,
            )
            return f(state, batch, epoch)

        return sharded_step

    def _local_train_step(self):
        """The per-chip step body shared by the jitted single-step and
        fused-loop entries (identical math; see ``train_steps_fused``)."""
        def local_step(state: TrainState, batch, epoch, ctx):
            rng, aug_rng, task_rng = jax.random.split(state.rng, 3)
            images = self.preprocess_train(aug_rng, batch["image"])

            def loss_fn(p):
                p_eff = (
                    stop_gradients_on_frozen(p, self.mask)
                    if self.mask is not None
                    else p
                )
                return self.loss_and_metric_sums_in_step(
                    p_eff, state, images, batch, task_rng, ctx
                )

            (loss, sums), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            if self._axis is not None:
                # explicit gradient all-reduce (classic shard_map style):
                # the steps run with check_vma=False because the VMA
                # machinery's auto-inserted cotangent psum CHECK-crashes
                # XLA ("Invalid binary instruction opcode copy") whenever
                # the mesh has a leftover auto axis (model-parallel dim)
                # and the grad path contains a bf16 cast — jax 0.9.0 bug,
                # minimal repro in tests/test_training.py
                grads = jax.lax.psum(grads, self._axis)
            lr = self.lr_value(epoch)
            opt_state = set_learning_rate(state.opt_state, lr)
            updates, opt_state = self.tx.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state, rng=rng, step=state.step + 1
            )
            new_state = self.post_update(new_state, epoch)
            sums = dict(self._psum_sums(sums))
            sums["lr"] = lr  # epoch function — invariant, never psum it
            return new_state, sums

        return local_step

    def _make_eval_step(self):
        def local_step(params, extra, batch, rng, ctx):
            images = self.preprocess_eval(batch["image"])
            sums = self.eval_metric_sums(params, extra, images, batch, rng, ctx)
            return dict(self._psum_sums(sums))

        if self._axis is None:
            return jax.jit(local_step, static_argnums=(4,))

        mesh = self._mesh
        P = jax.sharding.PartitionSpec

        @partial(jax.jit, static_argnums=(4,))
        def sharded_step(params, extra, batch, rng, ctx):
            f = jax.shard_map(
                partial(local_step, ctx=ctx),
                mesh=mesh,
                in_specs=(P(), P(), P("data"), P()),
                out_specs=P(),
                axis_names=self._manual_axes(),
                check_vma=False,
            )
            return f(params, extra, batch, rng)

        return sharded_step


def _weighted(per_example: jnp.ndarray, weight: jnp.ndarray):
    per_example = per_example.astype(jnp.float32)
    loss_sum = jnp.sum(per_example * weight)
    weight_sum = jnp.sum(weight)
    return loss_sum, weight_sum


class ClassifierTask(Task):
    """Supervised CE training of ViTClassifier (reference
    ``src/training/classifier.py:16-171``): CE + accuracy, AdamW over
    trainable params only, warmup×cosine WITHOUT batch scaling (quirk Q3),
    freeze policy as optimizer masking."""

    monitor = "val_acc"
    monitor_mode = "max"

    def __init__(
        self,
        model_cfg: dict,
        training_cfg: dict,
        num_classes: int = 10,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        augment: bool = True,
    ):
        super().__init__()
        self.model_cfg = model_cfg
        self.training_cfg = training_cfg
        self.model = classifier_from_config(
            model_cfg, num_classes=num_classes, dtype=dtype, attn_impl=attn_impl
        )
        self.base_lr = float(training_cfg.get("learning_rate", 3e-4))
        self.weight_decay = float(training_cfg.get("weight_decay", 0.05))
        self.warmup_epochs = int(training_cfg.get("warmup_epochs", 5))
        self.total_epochs = int(training_cfg.get("total_epochs", 100))
        self.grad_clip = 1.0
        self.augment = augment
        self.image_size = self.model.img_size
        self._freeze_encoder = bool(training_cfg.get("freeze_encoder", True))
        self._unfreeze_last = training_cfg.get("unfreeze_last_layers", None)

    def init_params(self, rng):
        dummy = jnp.zeros((1, self.image_size, self.image_size, self.model.in_chans))
        return jax.jit(self.model.init)(rng, dummy)["params"]

    def build_optimizer(self, params):
        self.mask = trainable_mask(
            params,
            freeze_encoder=self._freeze_encoder,
            unfreeze_last_layers=self._unfreeze_last,
            depth=self.model.depth,
        )
        return super().build_optimizer(params)

    def set_freeze_policy(self, freeze_encoder=False, unfreeze_last_layers=None):
        """Apply the reference's config-override precedence
        (``scripts/training/train_mae.py:166-176``) before init_state."""
        self._freeze_encoder = freeze_encoder
        self._unfreeze_last = unfreeze_last_layers

    def loss_and_metric_sums(self, params, images, batch, rng, ctx, extra=None):
        logits = self.model.apply({"params": params}, images)
        labels = batch["label"]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        per_ex = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        w = batch["weight"]
        loss_sum, weight_sum = _weighted(per_ex, w)
        correct = (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)
        acc_sum = jnp.sum(correct * w)
        k = min(5, logits.shape[-1])
        _, top5_idx = jax.lax.top_k(logits, k)  # top-5 (BASELINE config 3)
        in_top5 = jnp.any(top5_idx == labels[:, None], axis=1).astype(jnp.float32)
        top5_sum = jnp.sum(in_top5 * w)
        loss = loss_sum / self._loss_den(weight_sum)
        return loss, {
            "loss_sum": loss_sum,
            "acc_sum": acc_sum,
            "top5_sum": top5_sum,
            "weight_sum": weight_sum,
        }

    @staticmethod
    def epoch_metrics_from_sums(sums: Dict[str, float], prefix: str) -> Dict[str, float]:
        w = max(sums.get("weight_sum", 0.0), 1e-9)
        out = {
            f"{prefix}_loss": sums.get("loss_sum", 0.0) / w,
            f"{prefix}_acc": sums.get("acc_sum", 0.0) / w,
        }
        if "top5_sum" in sums:
            out[f"{prefix}_top5"] = sums["top5_sum"] / w
        return out


class MAETask(Task):
    """Self-supervised MAE pretraining (reference ``src/training/mae.py:14-83``):
    per-sample random masking, MSE on masked patches, AdamW with linear LR
    scaling lr·batch/256 (quirk Q3), warmup×cosine (quirk Q2), per-epoch
    mask-ratio ramp with denominator ramp_epochs-1."""

    monitor = "val_loss"
    monitor_mode = "min"

    def __init__(
        self,
        model_cfg: dict,
        training_cfg: dict,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        augment: Optional[bool] = None,
    ):
        super().__init__()
        self.model_cfg = model_cfg
        self.training_cfg = training_cfg
        self.model = mae_from_config(model_cfg, dtype=dtype, attn_impl=attn_impl)
        self.mask_start = float(training_cfg.get("mask_ratio_start", 0.5))
        self.mask_end = float(training_cfg.get("mask_ratio_end", 0.85))
        self.ramp_epochs = int(training_cfg.get("mask_ramp_epochs", 200))
        base = float(training_cfg.get("base_learning_rate", 1.5e-4))
        self.batch_size = int(training_cfg.get("batch_size", 512))
        self.base_lr = effective_pretrain_lr(base, self.batch_size)
        self.weight_decay = float(training_cfg.get("weight_decay", 0.05))
        self.warmup_epochs = int(training_cfg.get("warmup_epochs", 20))
        self.total_epochs = int(training_cfg.get("total_epochs", 200))
        self.grad_clip = 1.0
        # `augment` defaults ON (correct per-split transforms); pass False to
        # reproduce the reference's effective no-augmentation (quirk Q1).
        if augment is None:
            augment = bool(training_cfg.get("augment", True))
        self.augment = augment
        self.image_size = self.model.image_size
        self.sequence_length = self.model.sequence_length
        # Round-5 lever switch: masked-MSE via dense prediction + one-hot
        # weights instead of index gathers (numerics identical; measured
        # A/B in docs/PERFORMANCE.md). SSRL_MAE_DENSE_LOSS=0 restores the
        # gathered path.
        self.dense_loss = os.environ.get("SSRL_MAE_DENSE_LOSS", "0") == "1"

    def epoch_context(self, epoch: int):
        ratio = mask_ratio_at_epoch(
            epoch, self.mask_start, self.mask_end, self.ramp_epochs
        )
        return num_masked_tokens(self.sequence_length, ratio)

    def host_epoch_metrics(self, epoch: int) -> Dict[str, float]:
        return {
            "mask_ratio": mask_ratio_at_epoch(
                epoch, self.mask_start, self.mask_end, self.ramp_epochs
            )
        }

    def init_params(self, rng):
        dummy = jnp.zeros((1, self.image_size, self.image_size, self.model.in_chans))
        n_mask = num_masked_tokens(self.sequence_length, self.mask_end)
        idx_keep, idx_mask = random_token_mask(
            rng, 1, self.sequence_length, n_mask
        )
        return jax.jit(self.model.init)(rng, dummy, idx_keep, idx_mask)["params"]

    def loss_and_metric_sums(self, params, images, batch, rng, ctx, extra=None):
        n_mask = int(ctx)
        B = images.shape[0]
        idx_keep, idx_mask = self._draw_sliced(
            lambda r, b: random_token_mask(r, b, self.sequence_length, n_mask),
            rng, B,
        )
        if self.dense_loss:
            # Dense-loss formulation (round-5 lever): predict every token,
            # weight the squared error by a one-hot mask — identical loss
            # and grads to the gathered path (see forward_dense), minus
            # the gather/scatter matmuls and their relayout copies.
            pred, target = self.model.apply(
                {"params": params}, images, idx_keep,
                method="forward_dense",
            )
            # (B, L) occupancy of idx_mask in token space; the one-hot sum
            # reproduces gather semantics exactly (incl. duplicate counts).
            mask = jax.nn.one_hot(
                idx_mask, self.sequence_length, dtype=jnp.float32
            ).sum(axis=1)
            diff = (
                pred[:, 1:, :].astype(jnp.float32)
                - target.astype(jnp.float32)
            )
            per_ex = jnp.sum(
                diff * diff * mask[:, 1:, None], axis=(1, 2)
            ) / (n_mask * target.shape[-1])
        else:
            pred, target = self.model.apply(
                {"params": params}, images, idx_keep, idx_mask
            )
            per_ex = jnp.mean(
                (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
                axis=(1, 2),
            )
        w = batch["weight"]
        loss_sum, weight_sum = _weighted(per_ex, w)
        loss = loss_sum / self._loss_den(weight_sum)
        return loss, {"loss_sum": loss_sum, "weight_sum": weight_sum}

    @staticmethod
    def epoch_metrics_from_sums(sums: Dict[str, float], prefix: str) -> Dict[str, float]:
        w = max(sums.get("weight_sum", 0.0), 1e-9)
        return {f"{prefix}_loss": sums.get("loss_sum", 0.0) / w}
