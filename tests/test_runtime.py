"""Native data-path kernel tests: correctness vs numpy, threading, fallback."""

import numpy as np
import pytest

from ssrl_vit_mae_jepa_tpu.runtime import native


def _numpy_ref(raw, indices):
    return np.ascontiguousarray(raw[indices].transpose(0, 3, 2, 1))


class TestNativeGather:
    def test_builds_and_loads(self):
        assert native.native_available(), "g++ build of batch_gather.cpp failed"

    @pytest.mark.parametrize("B", [1, 7, 64])
    def test_matches_numpy(self, B):
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, (32, 3, 96, 96), dtype=np.uint8)
        idx = rng.integers(0, 32, B)
        out = native.gather_nhwc(raw, idx)
        np.testing.assert_array_equal(out, _numpy_ref(raw, idx))

    def test_multithreaded_matches(self):
        rng = np.random.default_rng(1)
        raw = rng.integers(0, 256, (64, 3, 96, 96), dtype=np.uint8)
        idx = rng.permutation(64)
        out = native.gather_nhwc(raw, idx, n_threads=8)
        np.testing.assert_array_equal(out, _numpy_ref(raw, idx))

    def test_fallback_matches(self, monkeypatch):
        monkeypatch.setattr(native, "_load", lambda: None)
        rng = np.random.default_rng(2)
        raw = rng.integers(0, 256, (8, 3, 96, 96), dtype=np.uint8)
        idx = np.array([3, 1, 7])
        out = native.gather_nhwc(raw, idx)
        np.testing.assert_array_equal(out, _numpy_ref(raw, idx))

    def test_out_of_range_index_raises(self):
        """Both paths (native C kernel and numpy fallback) reject OOB
        indices identically — a caller bug raises instead of silently
        zero-filling (native) or raising only without g++ (numpy)."""
        raw = np.full((4, 3, 96, 96), 7, np.uint8)
        with pytest.raises(IndexError, match="out of range"):
            native.gather_nhwc(raw, np.array([0, 99]))
        with pytest.raises(IndexError, match="out of range"):
            native.gather_nhwc(raw, np.array([-1]))
        out = native.gather_nhwc(raw, np.array([0, 3]))
        assert (out == 7).all()
