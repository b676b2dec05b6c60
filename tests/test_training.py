"""Trainer/task tests: freeze policy, schedules-in-step, learning, resume."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssrl_vit_mae_jepa_tpu.config import DEFAULTS, _deep_merge
from ssrl_vit_mae_jepa_tpu.data.loaders import (
    get_test_dataloader,
    get_train_dataloaders,
)
from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader
from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
from ssrl_vit_mae_jepa_tpu.parallel.mesh import get_mesh
from ssrl_vit_mae_jepa_tpu.training.optim import count_trainable, trainable_mask
from ssrl_vit_mae_jepa_tpu.training.tasks import ClassifierTask, MAETask
from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

SMALL_MODEL = {
    "general": {"image_size": 96, "patch_size": 8, "in_chans": 3},
    "encoder": {"embed_dim": 48, "depth": 2, "num_heads": 4},
    "decoder": {"decoder_embed_dim": 48, "decoder_depth": 1, "decoder_num_heads": 4},
    "head": {"pool": "cls"},
}


def small_cfg(**train_over):
    cfg = _deep_merge(DEFAULTS, {"model": SMALL_MODEL})
    cfg["train"].update(
        {"batch_size": 16, "samples_per_class": 4, "total_epochs": 2,
         "warmup_epochs": 1, "learning_rate": 1e-3, **train_over}
    )
    cfg["pretrain"].update(
        {"batch_size": 16, "total_epochs": 2, "warmup_epochs": 1,
         "mask_ratio_start": 0.75, "mask_ratio_end": 0.75, "val_split": 0.1,
         "data_fraction": 1.0}
    )
    return cfg


class TestFreezePolicy:
    def _params(self):
        task = ClassifierTask(SMALL_MODEL, {"freeze_encoder": False}, dtype=jnp.float32)
        return task, task.init_params(jax.random.PRNGKey(0))

    def test_freeze_encoder_only_head_trainable(self):
        _, params = self._params()
        mask = trainable_mask(params, freeze_encoder=True)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, trainable in flat:
            s = "/".join(str(getattr(p, "key", p)) for p in path)
            assert trainable == ("head" in s), s
        n = count_trainable(params, mask)
        assert n == 48 * 10 + 10  # single linear head

    def test_unfreeze_last_layers(self):
        _, params = self._params()
        mask = trainable_mask(params, unfreeze_last_layers=1, depth=2)
        flat = dict(
            (
                "/".join(str(getattr(p, "key", p)) for p in path),
                t,
            )
            for path, t in jax.tree_util.tree_flatten_with_path(mask)[0]
        )
        assert flat["encoder/blocks_1/attn/qkv/kernel"]
        assert not flat["encoder/blocks_0/attn/qkv/kernel"]
        assert flat["encoder/norm/scale"]
        assert not flat["encoder/blocks_0/norm1/scale"]
        assert not flat["encoder/pos_embed"]
        assert flat["head/classification/kernel"]

    def test_unfreeze_bounds(self):
        _, params = self._params()
        with pytest.raises(ValueError):
            trainable_mask(params, unfreeze_last_layers=5, depth=2)

    def test_frozen_params_unchanged_after_step(self, synthetic_stl10_dir):
        task = ClassifierTask(
            SMALL_MODEL,
            {"freeze_encoder": True, "learning_rate": 1e-2, "warmup_epochs": 1,
             "total_epochs": 2},
            dtype=jnp.float32,
        )
        state = task.init_state(jax.random.PRNGKey(0))
        before = jax.device_get(state.params)
        ds = STL10(synthetic_stl10_dir, "train")
        batch = next(iter(HostLoader(ds, np.arange(16), 16, shuffle=False).epoch(0)))
        state, _ = task.train_step(state, batch, 0, None)
        after = jax.device_get(state.params)
        np.testing.assert_array_equal(
            before["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"],
            after["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"],
        )
        assert not np.array_equal(
            before["head"]["classification"]["kernel"],
            after["head"]["classification"]["kernel"],
        )


class TestClassifierTraining:
    def test_probe_learns_synthetic(self, synthetic_stl10_dir, tmp_path):
        """Minimum end-to-end slice: frozen linear probe on synthetic STL-10
        must beat chance by a wide margin (class-correlated colors)."""
        cfg = small_cfg(
            freeze_encoder=True, total_epochs=8, learning_rate=5e-3,
            warmup_epochs=2,
        )
        train, val = get_train_dataloaders(cfg, data_dir=synthetic_stl10_dir)
        task = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
        trainer = Trainer(
            task, max_epochs=8, output_dir=tmp_path / "out",
            enable_checkpointing=True,
        )
        metrics = trainer.fit(train, val)
        assert metrics["train_acc"] > 0.3, metrics
        assert (tmp_path / "out/checkpoints/best.ckpt").exists()
        assert (tmp_path / "out/checkpoints/last.ckpt").exists()

    def test_step_granularity_logging(self, synthetic_stl10_dir, tmp_path):
        """log_every_n_steps writes per-step train records to metrics.jsonl
        (reference logs every 2 steps, pretrain_mae.py:122); off by default."""
        import json

        cfg = small_cfg(freeze_encoder=True, total_epochs=1)
        train, val = get_train_dataloaders(cfg, data_dir=synthetic_stl10_dir)
        task = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
        trainer = Trainer(task, 1, tmp_path / "steps", log_every_n_steps=2,
                          enable_checkpointing=False)
        trainer.fit(train, val)
        records = [json.loads(x) for x in
                   (tmp_path / "steps/metrics.jsonl").read_text().splitlines()]
        step_records = [r for r in records
                        if "train_loss" in r and "epoch_time_s" not in r]
        assert step_records, "no per-step records written"
        assert all(r["step"] % 2 == 0 for r in step_records)
        # default: per-epoch record only
        t2 = Trainer(task, 1, tmp_path / "nosteps", enable_checkpointing=False)
        t2.fit(train, val)
        records = [json.loads(x) for x in
                   (tmp_path / "nosteps/metrics.jsonl").read_text().splitlines()]
        assert all("epoch_time_s" in r for r in records if "train_loss" in r)

    def test_test_split_evaluation(self, synthetic_stl10_dir, tmp_path):
        cfg = small_cfg(freeze_encoder=True)
        task = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
        trainer = Trainer(task, 1, tmp_path / "o", enable_checkpointing=False)
        trainer.init_state()
        te = get_test_dataloader(cfg, data_dir=synthetic_stl10_dir)
        m = trainer.test(te)
        assert "test_acc" in m and "test_loss" in m
        assert 0.0 <= m["test_acc"] <= 1.0


class TestMAETraining:
    def test_loss_decreases(self, synthetic_stl10_dir, tmp_path):
        cfg = small_cfg()
        cfg["pretrain"]["base_learning_rate"] = 2e-3
        ds = STL10(synthetic_stl10_dir, "unlabeled")
        train = HostLoader(ds, np.arange(96), 16, shuffle=True, seed=73)
        val = HostLoader(ds, np.arange(96, 128), 16, shuffle=False)
        task = MAETask(cfg["model"], cfg["pretrain"], dtype=jnp.float32)
        trainer = Trainer(
            task, max_epochs=4, output_dir=tmp_path / "pre",
            enable_checkpointing=False,
        )
        trainer.init_state()
        m0 = trainer.evaluate(val, prefix="val", epoch=0)
        metrics = trainer.fit(train, val)
        assert metrics["val_loss"] < m0["val_loss"], (m0, metrics)

    def test_dense_loss_matches_gathered(self, monkeypatch):
        """SSRL_MAE_DENSE_LOSS=1 ≡ the gathered masked-MSE path.

        The dense formulation (forward_dense + one-hot loss weights) must
        reproduce the gathered path's loss AND parameter gradients exactly
        (fp32 model; same RNG → same mask draw — only the reduction
        structure differs, so tolerances are reassociation-level)."""
        cfg = small_cfg()

        def loss_and_grads(dense: bool):
            monkeypatch.setenv("SSRL_MAE_DENSE_LOSS", "1" if dense else "0")
            task = MAETask(cfg["model"], cfg["pretrain"], dtype=jnp.float32)
            assert task.dense_loss is dense
            params = task.init_params(jax.random.PRNGKey(11))
            rng = np.random.default_rng(5)
            images = jnp.asarray(
                rng.standard_normal((8, 96, 96, 3)), jnp.float32
            )
            batch = {"weight": jnp.ones((8,), jnp.float32)}
            ctx = task.epoch_context(0)

            def f(p):
                loss, _ = task.loss_and_metric_sums(
                    p, images, batch, jax.random.PRNGKey(3), ctx
                )
                return loss

            return jax.value_and_grad(f)(params)

        loss_g, grads_g = loss_and_grads(False)
        loss_d, grads_d = loss_and_grads(True)
        np.testing.assert_allclose(loss_d, loss_g, rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=5e-5, atol=1e-7
            ),
            jax.device_get(grads_d), jax.device_get(grads_g),
        )

    def test_patch_preprocess_matches_image_preprocess(self, monkeypatch):
        """SSRL_AUG_PATCHES=1 (default) ≡ the image-tensor augment path.

        The fused augment→patchify preprocess must reproduce the image
        path's loss AND parameter gradients (bit-identical pixel values
        enter the same GEMMs; only the reordering route differs)."""
        cfg = small_cfg()

        def loss_and_grads(patches: bool):
            monkeypatch.setenv("SSRL_AUG_PATCHES", "1" if patches else "0")
            task = MAETask(cfg["model"], cfg["pretrain"], dtype=jnp.float32)
            params = task.init_params(jax.random.PRNGKey(11))
            imgs_u8 = jnp.asarray(
                np.random.default_rng(5).integers(
                    0, 256, (8, 96, 96, 3), dtype=np.uint8
                )
            )
            batch = {"weight": jnp.ones((8,), jnp.float32)}
            ctx = task.epoch_context(0)
            x = task.preprocess_train(jax.random.PRNGKey(7), imgs_u8)
            assert x.ndim == (3 if patches else 4)

            def f(p):
                loss, _ = task.loss_and_metric_sums(
                    p, x, batch, jax.random.PRNGKey(3), ctx
                )
                return loss

            return jax.value_and_grad(f)(params)

        loss_i, grads_i = loss_and_grads(False)
        loss_p, grads_p = loss_and_grads(True)
        np.testing.assert_allclose(loss_p, loss_i, rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=5e-5, atol=1e-7
            ),
            jax.device_get(grads_p), jax.device_get(grads_i),
        )

    def test_fused_steps_match_sequential(self):
        """train_steps_fused(n) ≡ n sequential train_step dispatches.

        The fused entry (bench.py --fused) runs the SAME per-chip body in
        a lax.fori_loop inside one jit — params and metric sums after 3
        steps must match the per-step dispatch path bit-for-bit-ish
        (fp32 here; loop-carried reassociation stays within 1e-5)."""
        cfg = small_cfg()
        task = MAETask(cfg["model"], cfg["pretrain"], dtype=jnp.float32)
        task.configure_sharding(get_mesh())
        state0 = task.init_state(jax.random.PRNGKey(7))
        rng = np.random.default_rng(3)
        batch = {
            "image": rng.integers(0, 256, (16, 96, 96, 3)).astype(np.uint8),
            "label": rng.integers(0, 10, 16).astype(np.int32),
            "weight": np.ones((16,), np.float32),
        }
        ctx = task.epoch_context(0)
        copy = lambda s: jax.tree.map(jnp.copy, s)  # train_step donates state

        seq = copy(state0)
        for _ in range(3):
            seq, seq_sums = task.train_step(seq, batch, 0, ctx)
        fused, fused_sums = task.train_steps_fused(copy(state0), batch, 0, ctx, 3)

        assert int(fused.step) == int(seq.step) == 3
        np.testing.assert_allclose(
            fused_sums["loss_sum"], seq_sums["loss_sum"], rtol=1e-5
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
            jax.device_get(seq.params), jax.device_get(fused.params),
        )

    def test_mask_ramp_changes_context(self):
        cfg = small_cfg()
        cfg["pretrain"].update(
            {"mask_ratio_start": 0.5, "mask_ratio_end": 0.85, "mask_ramp_epochs": 5}
        )
        task = MAETask(cfg["model"], cfg["pretrain"], dtype=jnp.float32)
        assert task.epoch_context(0) == int(0.5 * 144)
        assert task.epoch_context(4) == int(0.85 * 144)
        assert task.host_epoch_metrics(2)["mask_ratio"] == pytest.approx(0.675)


class TestResume:
    def test_checkpoint_resume_roundtrip(self, synthetic_stl10_dir, tmp_path):
        cfg = small_cfg(freeze_encoder=True, total_epochs=4)
        train, val = get_train_dataloaders(cfg, data_dir=synthetic_stl10_dir)

        task = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
        t1 = Trainer(task, 2, tmp_path / "a", seed=73)
        t1.fit(train, val)
        last = tmp_path / "a/checkpoints/last.ckpt"
        assert last.exists()

        task2 = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
        t2 = Trainer(task2, 4, tmp_path / "b", seed=73)
        t2.init_state()
        start = t2._resume(last)
        assert start == 2
        # resumed params identical to saved ones
        p1 = jax.device_get(t1.state.params)
        p2 = jax.device_get(t2.state.params)
        jax.tree.map(np.testing.assert_array_equal, p1, p2)
        t2.fit(train, val, resume_from=last)


class TestMultiDevice:
    def test_dp_training_on_8_device_mesh(self, synthetic_stl10_dir, tmp_path):
        """Data-parallel step over the virtual 8-device CPU mesh."""
        assert jax.device_count() == 8
        mesh = get_mesh()
        assert mesh.shape == {"data": 8, "model": 1}
        cfg = small_cfg(freeze_encoder=False)
        train, val = get_train_dataloaders(cfg, data_dir=synthetic_stl10_dir)
        task = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
        trainer = Trainer(
            task, 1, tmp_path / "dp", mesh=mesh, enable_checkpointing=False
        )
        metrics = trainer.fit(train, val)
        assert "train_loss" in metrics and np.isfinite(metrics["train_loss"])

    def test_dp_matches_single_device(self, synthetic_stl10_dir, tmp_path):
        """One DP step must produce (numerically) the same params as 1-device."""
        cfg = small_cfg(freeze_encoder=True, learning_rate=1e-3)
        ds = STL10(synthetic_stl10_dir, "train")
        loader = HostLoader(ds, np.arange(16), 16, shuffle=False)

        def one_step(mesh):
            task = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
            tr = Trainer(
                task, 1, tmp_path / f"m{mesh.shape['data']}", mesh=mesh,
                seed=73, enable_checkpointing=False,
            )
            tr.fit(loader, None)
            return jax.device_get(tr.state.params)

        p8 = one_step(get_mesh())
        p1 = one_step(get_mesh(num_devices=1))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), p8, p1
        )

    def test_tp_mesh_runs(self, synthetic_stl10_dir, tmp_path):
        """Tensor-parallel param sharding (model axis) compiles and runs."""
        mesh = get_mesh(model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}
        cfg = small_cfg(freeze_encoder=False)
        ds = STL10(synthetic_stl10_dir, "train")
        loader = HostLoader(ds, np.arange(32), 16, shuffle=False)
        task = ClassifierTask(cfg["model"], cfg["train"], dtype=jnp.float32)
        trainer = Trainer(
            task, 1, tmp_path / "tp", mesh=mesh, enable_checkpointing=False
        )
        metrics = trainer.fit(loader, None)
        assert np.isfinite(metrics["train_loss"])

    def test_pallas_kernel_runs_inside_shard_map(self, synthetic_stl10_dir,
                                                 tmp_path):
        """The point of the shard_map conversion: a Pallas kernel (forced,
        interpret mode) executes inside the data-sharded step — GSPMD could
        never partition the Mosaic custom call, it replicated the full
        global batch on every chip. Also pins DP≡single-device equivalence
        ON the kernel path. Interpret mode lowers pallas_call to a host
        callback, which jax only supports when ALL mesh axes are manual —
        and real Mosaic kernels have the SAME limit ("Mosaic kernels
        cannot be automatically partitioned"), which is why Task makes
        every size-1 mesh axis manual (see test below)."""
        from jax.experimental.pallas import tpu as pltpu
        from jax.sharding import Mesh

        cfg = small_cfg(freeze_encoder=False, learning_rate=1e-3)
        ds = STL10(synthetic_stl10_dir, "train")
        loader = HostLoader(ds, np.arange(16), 16, shuffle=False)

        def data_only_mesh(n):
            return Mesh(np.asarray(jax.devices()[:n]), ("data",))

        def one_step(mesh):
            task = ClassifierTask(cfg["model"], cfg["train"],
                                  dtype=jnp.float32, attn_impl="split")
            tr = Trainer(
                task, 1, tmp_path / f"k{mesh.shape['data']}", mesh=mesh,
                seed=73, enable_checkpointing=False,
            )
            with pltpu.force_tpu_interpret_mode():
                tr.fit(loader, None)
            return jax.device_get(tr.state.params)

        p8 = one_step(data_only_mesh(8))
        p1 = one_step(data_only_mesh(1))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-4), p8, p1
        )

    def test_pallas_kernel_runs_on_production_mesh(self, synthetic_stl10_dir,
                                                   tmp_path):
        """Regression: the PRODUCTION mesh is (data, model) with model=1
        (parallel/mesh.get_mesh) even single-chip. Leaving the trivial
        model axis automatic in the shard_map kept the step body under
        GSPMD partitioning, where Mosaic custom calls refuse to lower —
        the default train step CRASHED on real TPU hardware
        (outputs/hw/watch/results.log, 2026-08-19). Interpret-mode
        pallas_call has the same all-axes-manual requirement, so forcing
        the kernel path on the production mesh reproduces the failure
        class on CPU: this test fails if any size-1 axis is left auto."""
        from jax.experimental.pallas import tpu as pltpu

        cfg = small_cfg(freeze_encoder=False, learning_rate=1e-3)
        ds = STL10(synthetic_stl10_dir, "train")
        loader = HostLoader(ds, np.arange(16), 16, shuffle=False)
        mesh = get_mesh()  # all 8 virtual devices: {data: 8, model: 1}
        assert mesh.shape == {"data": 8, "model": 1}
        task = ClassifierTask(cfg["model"], cfg["train"],
                              dtype=jnp.float32, attn_impl="split")
        assert task._manual_axes is not None  # set by configure_sharding
        tr = Trainer(
            task, 1, tmp_path / "prod_mesh", mesh=mesh, seed=73,
            enable_checkpointing=False,
        )
        assert task._manual_axes() == frozenset({"data", "model"})
        with pltpu.force_tpu_interpret_mode():
            metrics = tr.fit(loader, None)
        assert np.isfinite(metrics["train_loss"])

    @pytest.mark.slow
    def test_vma_psum_xla_bug_still_present(self):
        """Canary for the jax 0.9.0 bug that forces check_vma=False in
        Task's shard_map steps: grad through a bf16 cast inside shard_map
        on a mesh with a leftover AUTO axis CHECK-crashes XLA ("Invalid
        binary instruction opcode copy") when the VMA machinery inserts
        the cotangent psum. Runs in a subprocess (the crash is a C++
        abort). If this test FAILS after a jax upgrade, the bug is fixed —
        re-enable check_vma in tasks.py and delete this canary."""
        import subprocess
        import sys

        repro = """
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_platforms','cpu')
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(4,2), ('data','model'))
W = jnp.zeros((16,16), jnp.float32)
x = jax.device_put(jnp.zeros((8,16), jnp.float32), NamedSharding(mesh, P('data')))
def local(W, xb):
    def loss(w):
        return jnp.sum((xb.astype(jnp.bfloat16) @ w.astype(jnp.bfloat16)).astype(jnp.float32)**2)
    return jax.grad(loss)(W)
f = jax.jit(lambda w, xb: jax.shard_map(local, mesh=mesh, in_specs=(P(), P('data')),
                                        out_specs=P(), axis_names={'data'})(w, xb))
f(W, x)
print('NO-CRASH')
"""
        from tests.conftest import scrubbed_cpu_env

        env = scrubbed_cpu_env(
            XLA_FLAGS="--xla_force_host_platform_device_count=8")
        proc = subprocess.run(
            [sys.executable, "-c", repro], env=env, capture_output=True,
            text=True, timeout=300,
        )
        if "NO-CRASH" in proc.stdout and proc.returncode == 0:
            pytest.fail(
                "jax fixed the VMA cotangent-psum bug — re-enable check_vma "
                "in Task._make_train_step/_make_eval_step, drop this canary")
        # require the actual XLA CHECK signature: any other nonzero exit
        # means the repro itself broke (e.g. a signature change) and the
        # canary would otherwise stay green forever
        assert proc.returncode < 0 or "opcode copy" in proc.stderr, (
            f"repro script broke (exit {proc.returncode}) — fix it so the "
            f"canary keeps tracking the bug:\n{proc.stderr[-2000:]}"
        )
