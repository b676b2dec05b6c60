"""Training engine: epoch loops, sharded steps, checkpoints, logging.

The TPU-native replacement for ``pytorch_lightning.Trainer`` as the reference
uses it (``scripts/training/pretrain_mae.py:116-128``): fit/test loops,
bf16 compute policy (owned by the models), grad-clip (owned by the
optimizer), epoch-interval LR (inside the jitted step), best/last/periodic
checkpointing, metric logging, and resume.

Scaling: one ``jax.sharding.Mesh``; batches are sharded over the ``data``
axis, train state is replicated (or tensor-parallel via ``parallel.mesh``
rules), and the jitted steps run as ``jax.shard_map`` over the data axis
with explicit gradient/metric ``psum`` over ICI
(``Task.configure_sharding`` — GSPMD cannot partition the Pallas kernels,
so manual data sharding is the composition that scales). The same code
path runs single-chip (mesh of 1).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader, device_prefetch
from ssrl_vit_mae_jepa_tpu.parallel.mesh import get_mesh, param_shardings
from ssrl_vit_mae_jepa_tpu.training.state import TrainState
from ssrl_vit_mae_jepa_tpu.training.tasks import Task
from ssrl_vit_mae_jepa_tpu.utils.checkpoint import (
    CheckpointCallbacks,
    load_checkpoint,
    save_checkpoint,
)
from ssrl_vit_mae_jepa_tpu.utils.metrics_logger import MetricsLogger

EVAL_RNG_SEED = 4242


class Trainer:
    def __init__(
        self,
        task: Task,
        max_epochs: int,
        output_dir: str | Path,
        mesh: Optional[Mesh] = None,
        seed: int = 73,
        monitor: Optional[str] = None,
        monitor_mode: Optional[str] = None,
        periodic_ckpt_every: Optional[int] = None,
        log_every_n_steps: Optional[int] = None,
        enable_checkpointing: bool = True,
        hyper_parameters: Optional[Dict[str, Any]] = None,
        ckpt_backend: str = "native",
    ):
        self.task = task
        self.max_epochs = max_epochs
        self.output_dir = Path(output_dir)
        self.mesh = mesh if mesh is not None else get_mesh()
        # run the jitted steps as shard_map over the mesh's data axis —
        # Pallas kernels are opaque to GSPMD, so a plainly-jitted step
        # would replicate the full global batch on every chip
        task.configure_sharding(self.mesh)
        # multihost: exactly one process writes checkpoints/logs — every
        # process racing os.replace on the SAME tmp path can interleave
        # and corrupt the zip; state is replicated so process 0 suffices
        self._is_main = jax.process_index() == 0
        self.seed = seed
        self.log_every_n_steps = log_every_n_steps
        self.logger = MetricsLogger(self.output_dir)
        self.hyper_parameters = hyper_parameters or {}
        self.enable_checkpointing = enable_checkpointing
        self.callbacks = (
            CheckpointCallbacks(
                self.output_dir / "checkpoints",
                monitor=monitor or task.monitor,
                mode=monitor_mode or task.monitor_mode,
                periodic_every=periodic_ckpt_every,
                backend=ckpt_backend,
            )
            if enable_checkpointing
            else None
        )
        self.state: Optional[TrainState] = None
        self.global_step = 0

    # ------------------------------------------------------------------
    def _batch_shardings(self):
        s = NamedSharding(self.mesh, P("data"))
        return {"image": s, "label": s, "weight": s}

    def _place_state(self, state: TrainState) -> TrainState:
        shardings = param_shardings(state, self.mesh)
        return jax.device_put(state, shardings)

    def init_state(self, init_params_override=None) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        state = self.task.init_state(rng, init_params_override)
        self.state = self._place_state(state)
        return self.state

    # ------------------------------------------------------------------
    def fit(
        self,
        train_loader: HostLoader,
        val_loader: Optional[HostLoader] = None,
        resume_from: Optional[str | Path] = None,
        init_params_override=None,
    ) -> Dict[str, float]:
        n_data = self.mesh.shape.get("data", 1)
        # loader batch sizes are PER-PROCESS; the mesh's data axis spans all
        # processes, so the divisibility contract is on the global batch
        global_bs = train_loader.batch_size * jax.process_count()
        if global_bs % n_data:
            raise ValueError(
                f"global batch_size {global_bs} "
                f"({train_loader.batch_size} × {jax.process_count()} "
                f"processes) not divisible by data-parallel size {n_data}"
            )
        if self.state is None:
            self.init_state(init_params_override)
        self.task.on_fit_start(len(train_loader))
        start_epoch = 0
        if resume_from is not None:
            start_epoch = self._resume(resume_from)

        batch_shardings = self._batch_shardings()
        last_metrics: Dict[str, float] = {}
        for epoch in range(start_epoch, self.max_epochs):
            ctx = self.task.epoch_context(epoch)
            host_metrics = self.task.host_epoch_metrics(epoch)
            t0 = time.time()
            sums = None
            n_steps = 0
            for batch in device_prefetch(
                train_loader.epoch(epoch),
                batch_shardings,
                depth=getattr(train_loader, "prefetch_depth", 2),
            ):
                self.state, step_sums = self.task.train_step(
                    self.state, batch, epoch, ctx
                )
                sums = (
                    step_sums
                    if sums is None
                    else jax.tree.map(
                        lambda a, b: a + b if a.ndim == 0 else b, sums, step_sums
                    )
                )
                n_steps += 1
                self.global_step += 1
                # step-granularity logging (reference logs every 2 steps,
                # pretrain_mae.py:122). Off by default: each record costs a
                # host sync, and the epoch loop otherwise syncs only once.
                if (
                    self.log_every_n_steps
                    and self.global_step % self.log_every_n_steps == 0
                ):
                    step_metrics = self.task.epoch_metrics_from_sums(
                        jax.device_get(step_sums), "train"
                    )
                    if self._is_main:
                        self.logger.log(step_metrics, step=self.global_step,
                                        epoch=epoch)
            # one host sync per epoch
            sums = {} if sums is None else jax.device_get(sums)
            dt = time.time() - t0
            train_metrics = self.task.epoch_metrics_from_sums(sums, "train")
            metrics = {**host_metrics, **train_metrics}
            if "lr" in sums and n_steps:
                metrics["lr"] = float(sums["lr"]) / n_steps  # constant per epoch
            if val_loader is not None and len(val_loader) > 0:
                metrics.update(
                    self.evaluate(val_loader, prefix="val", epoch=epoch, ctx=ctx)
                )
            metrics["epoch_time_s"] = dt
            # real examples only — the last batch is padded to full size
            # with weight-0 wrap-around rows (HostLoader.epoch), which must
            # not inflate the throughput headline; under drop_last the tail
            # examples are not consumed at all
            n_images = (
                n_steps * train_loader.batch_size
                if getattr(train_loader, "drop_last", False)
                else train_loader.num_examples
            ) * jax.process_count()  # loaders hold per-process shards
            metrics["images_per_s"] = n_images / max(dt, 1e-9)
            if self._is_main:
                self.logger.log(metrics, step=self.global_step, epoch=epoch)
            shown = {
                k: round(v, 5)
                for k, v in metrics.items()
                if k not in ("epoch_time_s", "images_per_s")
            }
            print(
                f"Epoch {epoch}: {n_steps} steps, {dt:.1f}s, "
                f"{metrics['images_per_s']:.0f} img/s — {shown}"
            )
            if self.callbacks is not None:
                if self._is_main:
                    self.callbacks.on_epoch_end(
                        epoch,
                        metrics,
                        self.state,
                        meta_base={
                            "global_step": self.global_step,
                            "hyper_parameters": self.hyper_parameters,
                        },
                        weights_only_state={"params": self.state.params},
                    )
                else:
                    # ranks > 0: keep best_score/best_path bookkeeping in
                    # sync without touching the filesystem (metrics are
                    # globally reduced, so the decision matches rank 0's)
                    self.callbacks.record_epoch(epoch, metrics)
            last_metrics = metrics
            self.logger.flush()  # TB buffers ~2 min; flush per epoch
        return last_metrics

    # ------------------------------------------------------------------
    def evaluate(
        self,
        loader: HostLoader,
        prefix: str = "val",
        epoch: int = 0,
        ctx=None,
        params=None,
        extra=None,
    ) -> Dict[str, float]:
        if ctx is None:
            ctx = self.task.epoch_context(epoch)
        if params is None:
            params = self.state.params
            extra = self.state.extra
        elif extra is None:
            # explicit params without task-extra state (e.g. evaluating a
            # params-only JEPA checkpoint): derive the extra the same way
            # training starts it (JEPA: EMA target := the given encoder);
            # None for tasks without extra state
            extra = self.task.init_extra(params)
        batch_shardings = self._batch_shardings()
        sums = None
        base_rng = jax.random.PRNGKey(EVAL_RNG_SEED)
        for i, batch in enumerate(
            device_prefetch(
                loader.epoch(0),
                batch_shardings,
                depth=getattr(loader, "prefetch_depth", 2),
            )
        ):
            rng = jax.random.fold_in(base_rng, epoch * 100003 + i)
            s = self.task.eval_step(params, batch, rng, ctx, extra=extra)
            sums = s if sums is None else jax.tree.map(lambda a, b: a + b, sums, s)
        if sums is None:
            # an empty loader must fail loudly: epoch_metrics_from_sums({})
            # would report a perfect 0.0 loss/acc for a pipeline bug
            raise ValueError(
                f"evaluate() got an empty loader (prefix={prefix!r}): "
                "no batches were produced — check data_dir/fraction/split"
            )
        sums = jax.device_get(sums)
        return self.task.epoch_metrics_from_sums(sums, prefix)

    def test(self, loader: HostLoader, params=None, extra=None) -> Dict[str, float]:
        """Reference ``trainer.test`` equivalent → {"test_loss", "test_acc"}."""
        if params is None and self.state is None:
            self.init_state()
        return self.evaluate(loader, prefix="test", params=params, extra=extra)

    # ------------------------------------------------------------------
    def save(self, path: str | Path, meta: Optional[Dict[str, Any]] = None):
        meta = dict(meta or {})
        meta.setdefault("hyper_parameters", self.hyper_parameters)
        return save_checkpoint(path, self.state, meta)

    def _resume(self, path: str | Path) -> int:
        from ssrl_vit_mae_jepa_tpu.utils.orbax_io import is_orbax_checkpoint, load_orbax

        target = self.state
        if is_orbax_checkpoint(path):
            state, meta = load_orbax(path, target=target)
        else:
            state, meta = load_checkpoint(path, target=target)
        self.state = self._place_state(state)
        self.global_step = int(meta.get("global_step", 0))
        if self.callbacks is not None:
            cb = meta.get("callbacks", {})
            self.callbacks.best_score = cb.get("best_model_score")
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"🔁 Resumed from {path} at epoch {start_epoch}")
        return start_epoch

    def load_params_into_state(self, params):
        """Replace model params (keeping fresh optimizer state)."""
        if self.state is None:
            self.init_state()
        opt_state = self.task.tx.init(params)
        self.state = self._place_state(
            self.state.replace(params=params, opt_state=opt_state)
        )
        return self.state
