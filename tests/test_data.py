"""Tests for the STL-10 reader, split semantics, and host pipeline."""

import pytest
import numpy as np

from ssrl_vit_mae_jepa_tpu.data.pipeline import HostLoader, device_prefetch
from ssrl_vit_mae_jepa_tpu.data.stl10 import (
    STL10,
    pretrain_split_indices,
    stratified_split_indices,
    subset_first_n,
)


class TestReader:
    def test_shapes_and_labels(self, synthetic_stl10_dir):
        ds = STL10(synthetic_stl10_dir, "train")
        assert len(ds) == 80
        assert ds.labels.min() >= 0 and ds.labels.max() <= 9
        imgs = ds.images_nhwc(np.array([0, 3]))
        assert imgs.shape == (2, 96, 96, 3) and imgs.dtype == np.uint8
        un = STL10(synthetic_stl10_dir, "unlabeled")
        assert len(un) == 200
        assert (un.labels == -1).all()

    def test_binary_layout_roundtrip(self, tmp_path):
        """Reader must invert the torchvision layout: raw (N,C,W,H) → NHWC."""
        img_chw = np.arange(3 * 96 * 96, dtype=np.uint8).reshape(3, 96, 96)
        raw = img_chw.transpose(0, 2, 1)  # (C, W, H) as stored on disk
        d = tmp_path / "stl10_binary"
        d.mkdir()
        raw[None].tofile(d / "train_X.bin")
        np.array([1], np.uint8).tofile(d / "train_y.bin")
        ds = STL10(tmp_path, "train")
        got = ds.images_nhwc(np.array([0]))[0]
        np.testing.assert_array_equal(got, img_chw.transpose(1, 2, 0))
        np.testing.assert_array_equal(ds.image_chw(0), img_chw)


class TestSplits:
    def test_first_n_fraction(self):
        # quirk Q4: fraction subset is FIRST-N, not random
        np.testing.assert_array_equal(subset_first_n(10, 0.5), np.arange(5))
        np.testing.assert_array_equal(subset_first_n(10, 1.0), np.arange(10))

    def test_pretrain_split_sizes_and_determinism(self):
        tr1, va1 = pretrain_split_indices(1000, 0.5, 0.06, 73)
        tr2, va2 = pretrain_split_indices(1000, 0.5, 0.06, 73)
        assert len(tr1) == 470 and len(va1) == 30  # 500 * 0.06 = 30
        np.testing.assert_array_equal(tr1, tr2)
        assert set(tr1) | set(va1) == set(range(500))  # first-n pool
        tr3, _ = pretrain_split_indices(1000, 0.5, 0.06, 74)
        assert not np.array_equal(tr1, tr3)

    def test_stratified_matches_reference_numpy_exactly(self):
        """Bit-exact vs the reference loop (src/data.py:128-137, quirk Q5)."""
        rng = np.random.default_rng(5)
        labels = rng.integers(0, 10, 500)
        seed, spc = 73, 20
        # reference implementation, verbatim semantics
        ref_train, ref_val = [], []
        for c in np.unique(labels):
            cls_idx = np.where(labels == c)[0]
            np.random.default_rng(seed).shuffle(cls_idx)
            ref_train.extend(cls_idx[:spc])
            ref_val.extend(cls_idx[spc:])
        tr, va = stratified_split_indices(labels, spc, seed)
        np.testing.assert_array_equal(tr, np.asarray(ref_train))
        np.testing.assert_array_equal(va, np.asarray(ref_val))

    def test_stratified_counts(self):
        labels = np.repeat(np.arange(10), 50)
        tr, va = stratified_split_indices(labels, 30, 73)
        assert len(tr) == 300 and len(va) == 200
        for c in range(10):
            assert (labels[tr] == c).sum() == 30


class TestLoader:
    def test_padding_and_weights(self, synthetic_stl10_dir):
        ds = STL10(synthetic_stl10_dir, "train")
        loader = HostLoader(ds, np.arange(50), batch_size=16, shuffle=False)
        batches = list(loader.epoch(0))
        assert len(batches) == 4
        for b in batches[:-1]:
            assert b["weight"].sum() == 16
        last = batches[-1]
        assert last["image"].shape == (16, 96, 96, 3)
        assert last["weight"].sum() == 2  # 50 = 3*16 + 2
        assert (last["weight"][:2] == 1).all() and (last["weight"][2:] == 0).all()

    def test_shuffle_determinism_and_coverage(self, synthetic_stl10_dir):
        ds = STL10(synthetic_stl10_dir, "train")
        loader = HostLoader(ds, np.arange(80), batch_size=16, shuffle=True, seed=73)
        l1 = [b["label"] for b in loader.epoch(0)]
        l2 = [b["label"] for b in loader.epoch(0)]
        l3 = [b["label"] for b in loader.epoch(1)]
        np.testing.assert_array_equal(np.concatenate(l1), np.concatenate(l2))
        assert not np.array_equal(np.concatenate(l1), np.concatenate(l3))
        np.testing.assert_array_equal(
            np.sort(np.concatenate(l1)), np.sort(ds.labels[:80])
        )

    def test_device_prefetch(self, synthetic_stl10_dir):
        import jax

        ds = STL10(synthetic_stl10_dir, "train")
        loader = HostLoader(ds, np.arange(32), batch_size=16, shuffle=False)
        out = list(device_prefetch(loader.epoch(0)))
        assert len(out) == 2
        assert isinstance(out[0]["image"], jax.Array)


class TestLoaderFactories:
    def test_reference_api(self, synthetic_stl10_dir):
        from ssrl_vit_mae_jepa_tpu.data.loaders import (
            get_pretrain_dataloaders,
            get_test_dataloader,
            get_train_dataloaders,
        )

        cfg = {
            "seed": 73,
            "pretrain": {"batch_size": 16, "val_split": 0.1, "data_fraction": 0.5},
            "train": {"batch_size": 16, "samples_per_class": 4},
            "test": {"batch_size": 16},
        }
        tr, va = get_pretrain_dataloaders(cfg, data_dir=synthetic_stl10_dir)
        assert tr.num_examples == 90 and va.num_examples == 10  # 200*0.5 → 100
        tr2, va2 = get_train_dataloaders(cfg, data_dir=synthetic_stl10_dir)
        assert tr2.num_examples <= 40  # ≤ 4/class × 10 (synthetic may have fewer)
        te = get_test_dataloader(cfg, data_dir=synthetic_stl10_dir)
        assert te.num_examples == 40


class TestMultihostSharding:
    def test_factories_shard_indices_per_process(self, synthetic_stl10_dir,
                                                 monkeypatch):
        """Under process_count>1 the factories must hand each process a
        DISJOINT index shard at batch_size // process_count — regression:
        every process fed the same full batch (duplicated data at an
        inflated effective batch)."""
        import jax

        from ssrl_vit_mae_jepa_tpu.data.loaders import get_pretrain_dataloaders

        cfg = {"pretrain": {"batch_size": 16, "data_fraction": 1.0,
                            "val_split": 0.25},
               "seed": 73}
        shards = []
        for pi in range(2):
            monkeypatch.setattr(jax, "process_count", lambda: 2)
            monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
            train, val = get_pretrain_dataloaders(cfg, synthetic_stl10_dir)
            assert train.batch_size == 8  # 16 global / 2 processes
            shards.append(np.asarray(train.indices))
        monkeypatch.undo()
        assert not set(shards[0]) & set(shards[1])  # disjoint
        full_train, _ = get_pretrain_dataloaders(cfg, synthetic_stl10_dir)
        assert set(shards[0]) | set(shards[1]) == set(full_train.indices)

    def test_indivisible_global_batch_rejected(self, synthetic_stl10_dir,
                                               monkeypatch):
        import jax

        from ssrl_vit_mae_jepa_tpu.data.loaders import get_test_dataloader

        monkeypatch.setattr(jax, "process_count", lambda: 3)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        with pytest.raises(ValueError, match="not divisible"):
            get_test_dataloader({"test": {"batch_size": 16}}, synthetic_stl10_dir)


class TestPrefetchRobustness:
    def test_no_batch_dropped_when_queue_full_at_exhaustion(self, synthetic_stl10_dir):
        """The worker must never discard a queued batch to enqueue its end
        sentinel (regression: the epoch's last batch silently vanished when
        the consumer was slower than the producer)."""
        import time

        ds = STL10(synthetic_stl10_dir, "unlabeled")
        loader = HostLoader(ds, np.arange(40), 8, shuffle=False)
        seen = 0
        for batch in device_prefetch(loader.epoch(0), None, depth=1):
            time.sleep(0.3)  # force the queue to fill before we drain it
            seen += 1
        assert seen == len(loader) == 5

    def test_abandoned_generator_releases_worker(self, synthetic_stl10_dir):
        import threading
        import time

        ds = STL10(synthetic_stl10_dir, "unlabeled")
        loader = HostLoader(ds, np.arange(80), 8, shuffle=False)
        before = threading.active_count()
        gen = device_prefetch(loader.epoch(0), None, depth=1)
        next(gen)
        gen.close()  # abandon mid-epoch
        deadline = time.time() + 5
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before


class TestTextureSignal:
    """The representation-quality instrument (VERDICT r3 #2): the texture
    class signal must be invisible to first-order pixel statistics but
    present in phase-invariant spectral energy."""

    @pytest.fixture(scope="class")
    def texture_ds(self, tmp_path_factory):
        from ssrl_vit_mae_jepa_tpu.data.stl10 import write_synthetic_stl10

        root = tmp_path_factory.mktemp("texture_data")
        write_synthetic_stl10(
            root, num_train=300, num_test=10, num_unlabeled=10, seed=3,
            class_signal="texture",
        )
        return STL10(root, "train")

    def test_channel_means_matched_across_classes(self, texture_ds):
        ds = texture_ds
        x = ds.images_nhwc(np.arange(len(ds))).astype(np.float32)
        means = np.stack([
            x[ds.labels == c].mean(axis=(0, 1, 2)) for c in range(10)
        ])
        # per-class channel means agree to sampling noise (no linear
        # color/mean shortcut; the old "linear" signal had spreads ~30)
        assert means.std(axis=0).max() < 4.0, means

    def test_spectral_energy_identifies_class(self, texture_ds):
        ds = texture_ds
        x = ds.images_nhwc(np.arange(len(ds))).astype(np.float32).mean(-1)
        n = x.shape[0]
        size = x.shape[1]
        g = np.arange(size, dtype=np.float32) / size
        yy, xx = np.meshgrid(g, g, indexing="ij")
        # quadrature energy at each class's fundamental grating: invariant
        # to the per-image random phase, so it reads the class spectrum.
        # Axes are swapped vs the generator because the STL-10 raw layout is
        # (N, C, W, H) and the reader emits NHWC — a fixed transpose that
        # only relabels orientations.
        energies = np.zeros((n, 10), np.float32)
        for c in range(10):
            th = np.pi * (c % 5) / 5.0
            f = 6.0 if c < 5 else 12.0
            proj = 2 * np.pi * f * (np.cos(th) * yy + np.sin(th) * xx)
            cosb, sinb = np.cos(proj), np.sin(proj)
            e = (x.reshape(n, -1) @ cosb.reshape(-1)) ** 2 + (
                x.reshape(n, -1) @ sinb.reshape(-1)
            ) ** 2
            energies[:, c] = e
        pred = energies.argmax(axis=1)
        acc = (pred == ds.labels).mean()
        # the matched-filter (an oracle ENCODER, not a linear pixel map —
        # energy is quadratic and phase-invariant) decodes almost perfectly
        assert acc > 0.9, acc

    def test_raw_pixel_knn_near_chance(self, texture_ds):
        from scripts.evaluation.knn_eval import knn_predict

        ds = texture_ds
        x = ds.images_nhwc(np.arange(len(ds))).astype(np.float32)
        flat = x.reshape(len(ds), -1)
        # leave-one-out style split: first 240 reference, last 60 queries
        pred = knn_predict(flat[:240], ds.labels[:240], flat[240:], k=10)
        acc = (pred == ds.labels[240:]).mean()
        assert acc < 0.35, acc  # measured ~0.13 at scale; chance = 0.10
