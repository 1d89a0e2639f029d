"""Sampler unit tests (reference ml3d/datasets/samplers/)."""

import numpy as np


class _FakeSplit:

    def __init__(self, clouds, split="test"):
        self.clouds = clouds
        self.split = split

    def __len__(self):
        return len(self.clouds)

    def get_data(self, idx):
        return {"point": self.clouds[idx]}

    def get_attr(self, idx):
        return {"name": f"cloud_{idx}", "split": self.split}


class _FakeLoader:
    cache_convert = None
    preprocess = None

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


class TestSpatiallyRegularSampler:

    def _sampler(self, split="test", n=(400, 300)):
        from open3d_ml_tpu.datasets.samplers import (
            SemSegSpatiallyRegularSampler)
        rng = np.random.default_rng(0)
        clouds = [rng.uniform(0, 10, (k, 3)).astype(np.float32) for k in n]
        s = SemSegSpatiallyRegularSampler(_FakeSplit(clouds, split))
        s.initialize_with_dataloader(_FakeLoader(len(n)))
        return s, clouds

    def test_initial_possibilities_small(self):
        s, _ = self._sampler()
        assert len(s.possibilities) == 2
        for p in s.possibilities:
            assert p.max() < 1e-3

    def test_test_split_covers_all_clouds(self):
        from scipy.spatial import cKDTree
        s, clouds = self._sampler("test")
        point_sampler = s.get_point_sampler()
        trees = [cKDTree(c) for c in clouds]
        steps = 0
        for cid in s.get_cloud_sampler():
            s.cloud_id = cid
            point_sampler(pc=clouds[cid], num_points=128,
                          search_tree=trees[cid])
            steps += 1
            assert steps < 500, "possibility loop failed to converge"
        # loop exits only when every cloud's min possibility > 0.5
        assert all(m > 0.5 for m in s.min_possibilities)

    def test_coverage_credit_highest_at_center(self):
        from scipy.spatial import cKDTree
        s, clouds = self._sampler("test", n=(400,))
        point_sampler = s.get_point_sampler()
        tree = cKDTree(clouds[0])
        s.cloud_id = 0
        center_id = int(np.argmin(s.possibilities[0]))
        patch, idxs, center = point_sampler(pc=clouds[0], num_points=64,
                                            search_tree=tree)
        assert patch.shape == (64, 3)
        # the center point got (close to) the max credit of its patch
        assert s.possibilities[0][center_id] >= \
            0.99 * s.possibilities[0][idxs].max()

    def test_train_split_picks_least_covered_cloud(self):
        s, _ = self._sampler("training")
        s.possibilities[0][:] = 0.9
        s.min_possibilities[0] = 0.9
        cid = next(s.get_cloud_sampler())
        assert cid == 1


class TestRandomSampler:

    def test_cloud_cycling(self):
        from open3d_ml_tpu.datasets.samplers import SemSegRandomSampler
        rng = np.random.default_rng(0)
        clouds = [rng.uniform(0, 1, (50, 3)) for _ in range(3)]
        s = SemSegRandomSampler(_FakeSplit(clouds, "training"))
        ids = [next(s.get_cloud_sampler()) for _ in range(3)]
        assert all(0 <= i < 3 for i in ids)
