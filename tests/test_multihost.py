"""Multi-host helper tests (index sharding logic; single-process runtime)."""

import numpy as np

from ssrl_vit_mae_jepa_tpu.parallel.multihost import process_local_indices


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
