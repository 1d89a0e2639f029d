"""Native C++ layer tests (nanoknn: KD-tree KNN/radius + grid subsample),
the host-side replacement for the reference's open3d.core.nns /
contrib.subsample C++ ops."""

import numpy as np
import pytest

from open3d_ml_tpu.native import native_available


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


class TestNativeKDTree:

    def test_knn_matches_scipy(self):
        from scipy.spatial import cKDTree
        from open3d_ml_tpu.native import NativeKDTree

        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 10, (2000, 3)).astype(np.float32)
        q = rng.uniform(0, 10, (128, 3)).astype(np.float32)
        tree = NativeKDTree(pts)
        _, idx = tree.query(q, k=8)
        ref_d, ref_i = cKDTree(pts).query(q, k=8)
        # same neighbor sets (order can differ on exact ties)
        d = np.linalg.norm(pts[idx] - q[:, None, :], axis=-1)
        np.testing.assert_allclose(np.sort(d, axis=1),
                                   np.sort(ref_d, axis=1), rtol=1e-4)

    def test_radius_query(self):
        from scipy.spatial import cKDTree
        from open3d_ml_tpu.native import NativeKDTree

        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 4, (1000, 3)).astype(np.float32)
        q = pts[:16]
        lists = NativeKDTree(pts).query_radius(q, r=0.5, cap=256)
        ref = cKDTree(pts).query_ball_point(q, r=0.5)
        for j in range(16):
            assert len(lists[j]) == len(ref[j])
            assert set(np.asarray(lists[j]).tolist()) == set(ref[j])


class TestNativeGridSubsample:

    def test_barycenters(self):
        from open3d_ml_tpu.native import grid_subsample_native

        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
        sub = grid_subsample_native(pts, grid_size=0.5)
        sub_pts = sub[0] if isinstance(sub, tuple) else sub
        assert sub_pts.shape[0] < 500
        assert sub_pts.shape[1] == 3
        # each barycenter lies within the cloud bounds
        assert sub_pts.min() >= -0.01 and sub_pts.max() <= 2.01
