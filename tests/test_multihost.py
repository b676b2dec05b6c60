"""Multi-host tests: index-sharding logic + an EXECUTED 2-process run.

The executed test launches two subprocesses that join a real
``jax.distributed`` coordinator (4 virtual CPU devices each → 8 global),
run one MAE training epoch through the full trainer/prefetcher stack —
covering ``maybe_initialize_distributed``, ``process_local_indices``,
``global_batch``, and the multi-host branch of ``device_prefetch`` — and
asserts the loss matches a single-process 8-device run bit-for-bit-ish.
"""

import ast
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ssrl_vit_mae_jepa_tpu.parallel.multihost import process_local_indices

REPO = Path(__file__).resolve().parents[1]


class TestProcessSharding:
    def test_even_split(self):
        idx = np.arange(100)
        shards = [process_local_indices(idx, pi, 4) for pi in range(4)]
        assert all(len(s) == 25 for s in shards)
        np.testing.assert_array_equal(np.sort(np.concatenate(shards)), idx)

    def test_uneven_split_pads_by_wraparound(self):
        idx = np.arange(10)
        shards = [process_local_indices(idx, pi, 4) for pi in range(4)]
        assert all(len(s) == 3 for s in shards)  # ceil(10/4)
        union = set(np.concatenate(shards).tolist())
        assert union == set(range(10))  # every example covered

    def test_single_process_identity(self):
        idx = np.arange(7)
        np.testing.assert_array_equal(process_local_indices(idx, 0, 1), idx)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path, synthetic_stl10_dir):
    """Two real jax.distributed processes × 4 devices ≡ one process × 8."""
    port = _free_port()
    workers = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "PYTHONPATH": str(REPO),
            "SSRL_COORDINATOR": f"127.0.0.1:{port}",
            "SSRL_NUM_PROCESSES": "2",
            "SSRL_PROCESS_ID": str(pid),
        })
        workers.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests/_multihost_worker.py"),
             str(synthetic_stl10_dir), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    try:
        outs = [w.communicate(timeout=600) for w in workers]
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    losses = []
    for w, (out, errtxt) in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out[-2000:]}\n{errtxt[-3000:]}"
        line = [x for x in out.splitlines() if x.startswith("MULTIHOST_TRAIN_LOSS=")]
        assert line, out
        losses.append(float(line[0].split("=")[1]))
    # both processes observe the same global loss
    assert losses[0] == pytest.approx(losses[1], abs=1e-9), losses

    # single-process reference on 8 local devices, same global batch order
    from tests._multihost_worker import GLOBAL_EXAMPLES, MODEL_CFG, PRETRAIN_CFG
    from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader
    from ssrl_vit_mae_jepa_tpu.data.stl10 import STL10
    from ssrl_vit_mae_jepa_tpu.training.tasks import MAETask
    from ssrl_vit_mae_jepa_tpu.training.trainer import Trainer

    import jax
    import jax.numpy as jnp

    order = np.concatenate([
        process_local_indices(np.arange(GLOBAL_EXAMPLES), pi, 2) for pi in range(2)
    ])
    ds = STL10(synthetic_stl10_dir, "unlabeled")
    loader = HostLoader(ds, order, GLOBAL_EXAMPLES, shuffle=False)
    task = MAETask(MODEL_CFG, PRETRAIN_CFG, dtype=jnp.float32)
    trainer = Trainer(task, max_epochs=1, output_dir=tmp_path / "single",
                      enable_checkpointing=False)
    assert jax.device_count() == 8
    ref = trainer.fit(loader)["train_loss"]
    assert losses[0] == pytest.approx(ref, abs=1e-5), (losses, ref)


@pytest.mark.slow
def test_two_process_jepa_ema_replicated(tmp_path, synthetic_stl10_dir):
    """One JEPA epoch across two REAL jax.distributed processes: the EMA
    target tower (TrainState.extra) must end replicated-consistent — both
    ranks apply the same psum-ed update and EMA blend — and the collapse
    telemetry must come out of the sharded step finite and identical."""
    port = _free_port()
    workers = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "PYTHONPATH": str(REPO),
            "SSRL_COORDINATOR": f"127.0.0.1:{port}",
            "SSRL_NUM_PROCESSES": "2",
            "SSRL_PROCESS_ID": str(pid),
            "SSRL_WORKER_MODE": "jepa",
        })
        workers.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests/_multihost_worker.py"),
             str(synthetic_stl10_dir), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    try:
        outs = [w.communicate(timeout=600) for w in workers]
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()

    def _val(out, key):
        line = [x for x in out.splitlines() if x.startswith(f"{key}=")]
        assert line, (key, out)
        return float(line[0].split("=")[1])

    rows = []
    for w, (out, errtxt) in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out[-2000:]}\n{errtxt[-3000:]}"
        rows.append({
            "loss": _val(out, "MULTIHOST_TRAIN_LOSS"),
            "pred_std": _val(out, "MULTIHOST_PRED_STD"),
            "ema": _val(out, "MULTIHOST_EMA_CHECKSUM"),
            "online": _val(out, "MULTIHOST_ONLINE_CHECKSUM"),
        })
    for key in ("loss", "pred_std", "ema", "online"):
        assert rows[0][key] == pytest.approx(rows[1][key], abs=1e-9), (key, rows)
        assert np.isfinite(rows[0][key]), (key, rows)
    # the EMA tower lags the online encoder (momentum < 1): checksums differ
    assert rows[0]["ema"] != pytest.approx(rows[0]["online"], abs=1e-12), rows


@pytest.mark.slow
def test_two_process_factory_loaders_shard(tmp_path, synthetic_stl10_dir):
    """The CLI loader factories, under REAL jax.distributed: each process
    gets a disjoint index shard at global_batch/2 rows, the shards cover
    the split, and a full fit epoch (train + val) completes with the same
    finite global loss on both processes."""
    port = _free_port()
    workers = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "PYTHONPATH": str(REPO),
            "SSRL_COORDINATOR": f"127.0.0.1:{port}",
            "SSRL_NUM_PROCESSES": "2",
            "SSRL_PROCESS_ID": str(pid),
            "SSRL_WORKER_MODE": "factory",
        })
        workers.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests/_multihost_worker.py"),
             str(synthetic_stl10_dir), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    try:
        outs = [w.communicate(timeout=600) for w in workers]
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    shards, losses = [], []
    for w, (out, errtxt) in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{out[-2000:]}\n{errtxt[-3000:]}"
        shard = [x for x in out.splitlines() if x.startswith("MULTIHOST_SHARD=")]
        loss = [x for x in out.splitlines()
                if x.startswith("MULTIHOST_TRAIN_LOSS=")]
        assert shard and loss, out
        shards.append(set(ast.literal_eval(shard[0].split("=", 1)[1])))
        losses.append(float(loss[0].split("=")[1]))
    assert not shards[0] & shards[1], "factory shards overlap"
    assert losses[0] == pytest.approx(losses[1], abs=1e-9), losses
    assert np.isfinite(losses[0])
    # only process 0 writes metrics (trainer._is_main gating — every
    # process racing the same ckpt tmp path can corrupt the zip)
    log0 = tmp_path / "f0" / "metrics.jsonl"
    log1 = tmp_path / "f1" / "metrics.jsonl"
    assert log0.exists() and log0.stat().st_size > 0
    assert not log1.exists() or log1.stat().st_size == 0
