"""Golden tests for the ops layer against numpy/scipy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from open3d_ml_tpu import ops


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestRagged:

    def test_segment_ids_roundtrip(self):
        rs = jnp.array([0, 3, 3, 7, 10], jnp.int32)
        seg = ops.row_splits_to_segment_ids(rs, 12)
        np.testing.assert_array_equal(
            np.asarray(seg), [0, 0, 0, 2, 2, 2, 2, 3, 3, 3, 4, 4])
        back = ops.segment_ids_to_row_splits(seg[:10], 4)
        np.testing.assert_array_equal(np.asarray(back), [0, 3, 3, 7, 10])

    def test_ragged_to_dense(self):
        values = jnp.arange(10, dtype=jnp.float32)
        rs = jnp.array([0, 3, 3, 7, 10], jnp.int32)
        dense = ops.ragged_to_dense(values, rs, 4, 3, default_value=-1)
        expect = np.array([[0, 1, 2], [-1, -1, -1], [3, 4, 5], [7, 8, 9]],
                          np.float32)
        np.testing.assert_array_equal(np.asarray(dense), expect)

    def test_ragged_to_dense_vector_values(self):
        values = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
        rs = jnp.array([0, 2, 6], jnp.int32)
        dense = ops.ragged_to_dense(values, rs, 2, 4, default_value=0)
        assert dense.shape == (2, 4, 2)
        np.testing.assert_array_equal(np.asarray(dense[0, :2]),
                                      [[0, 1], [2, 3]])
        np.testing.assert_array_equal(np.asarray(dense[1]),
                                      [[4, 5], [6, 7], [8, 9], [10, 11]])

    def test_reduce_subarrays_sum(self):
        values = jnp.arange(10, dtype=jnp.float32)
        rs = jnp.array([0, 3, 3, 7, 10], jnp.int32)
        out = ops.reduce_subarrays_sum(values, rs)
        np.testing.assert_allclose(np.asarray(out), [3, 0, 18, 24])


class TestKNN:

    def test_exact_knn_matches_kdtree(self, rng):
        pts = rng.standard_normal((500, 3)).astype(np.float32)
        q = rng.standard_normal((100, 3)).astype(np.float32)
        idx, d2 = jax.jit(
            lambda p, qq: ops.knn_search(p, qq, 8))(pts, q)
        tree = cKDTree(pts)
        ref_d, ref_i = tree.query(q, k=8)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, atol=1e-4)
        # indices can differ on exact ties; compare distances per slot
        got_d = np.linalg.norm(pts[np.asarray(idx)] - q[:, None], axis=-1)
        np.testing.assert_allclose(got_d, ref_d, atol=1e-4)

    def test_knn_chunked(self, rng):
        pts = rng.standard_normal((300, 3)).astype(np.float32)
        q = rng.standard_normal((257, 3)).astype(np.float32)
        idx_a, _ = ops.knn_search(pts, q, 4, chunk=64)
        idx_b, _ = ops.knn_search(pts, q, 4, chunk=10_000)
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))

    def test_knn_mask(self, rng):
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        mask = np.zeros(50, bool)
        mask[:10] = True
        idx, _ = ops.knn_search(pts, pts[:5], 3,
                                points_mask=jnp.asarray(mask))
        assert np.asarray(idx).max() < 10

    def test_radius_search(self, rng):
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        q = pts[:50]
        r = 0.5
        idx, mask, counts = ops.radius_search(pts, q, r, 16)
        tree = cKDTree(pts)
        ref = tree.query_ball_point(q, r)
        ref_counts = np.array([len(x) for x in ref])
        np.testing.assert_array_equal(np.asarray(counts), ref_counts)
        got_sets = [
            set(np.asarray(idx[i])[np.asarray(mask[i])]) for i in range(50)
        ]
        for i in range(50):
            expect = set(ref[i])
            if len(expect) <= 16:
                assert got_sets[i] == expect
            else:
                assert got_sets[i] <= expect and len(got_sets[i]) == 16

    def test_knn_grid_near_exact(self, rng):
        """Adaptive grid KNN: first neighbors exact, overall near-exact."""
        pts = rng.uniform(0, 4, (400, 3)).astype(np.float32)
        idx, d2 = ops.knn_grid(jnp.asarray(pts), jnp.asarray(pts[:100]), 8,
                               (0.5, 1.0, 2.0), n_global=0)
        tree = cKDTree(pts)
        rd, _ = tree.query(pts[:100], k=8)
        got = np.sqrt(np.asarray(d2))
        # self + nearest neighbor always exact
        np.testing.assert_allclose(got[:, :2], rd[:, :2], atol=1e-4)
        # >= 97% of all neighbor slots exact
        frac = np.mean(np.abs(got - rd) < 1e-4)
        assert frac > 0.97, frac

    def test_knn_grid_recall_varying_density(self, rng):
        n = 5000
        r = rng.uniform(1, 30, n)
        th = rng.uniform(0, 2 * np.pi, n)
        pts = np.column_stack([
            r * np.cos(th), r * np.sin(th),
            0.1 * rng.standard_normal(n)
        ]).astype(np.float32)
        idx, _ = ops.knn_grid(jnp.asarray(pts), jnp.asarray(pts), 8,
                              (0.25, 1.0, 4.0, 16.0))
        idx = np.asarray(idx)
        _, ri = cKDTree(pts).query(pts, k=8)
        recall = np.mean(
            [len(set(idx[i]) & set(ri[i])) / 8 for i in range(0, n, 23)])
        assert recall > 0.93, recall

    def test_ball_query_fills(self, rng):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        q = pts[:10] + 100.0  # far away: no in-radius neighbors
        idx, mask = ops.ball_query(pts, q, 0.1, 4)
        assert not np.asarray(mask).any()
        assert np.asarray(idx).shape == (10, 4)


class TestVoxelize:

    def test_basic_grouping(self):
        pts = np.array([
            [0.1, 0.1, 0.1],
            [0.2, 0.2, 0.2],  # same voxel as above
            [1.5, 0.1, 0.1],
            [0.1, 1.5, 0.1],
            [9.9, 9.9, 9.9],  # out of range
        ], np.float32)
        vd = ops.voxelize(jnp.asarray(pts), (1.0, 1.0, 1.0), (0, 0, 0),
                          (3, 3, 3), max_voxels=8, max_points_per_voxel=4)
        assert int(vd.num_voxels) == 3
        counts = np.asarray(vd.num_points_per_voxel)[:3]
        assert sorted(counts.tolist()) == [1, 1, 2]
        # voxel containing first two points
        coords = np.asarray(vd.coords)[:3]
        row = np.where((coords == [0, 0, 0]).all(axis=1))[0][0]
        got = set(np.asarray(vd.point_indices)[row][
            np.asarray(vd.point_mask)[row]])
        assert got == {0, 1}

    def test_caps(self, rng):
        pts = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        vd = ops.voxelize(jnp.asarray(pts), (10.0, 10.0, 10.0), (0, 0, 0),
                          (10, 10, 10), max_voxels=4, max_points_per_voxel=8)
        # all 100 points fall in one voxel; capped at 8
        assert int(vd.num_voxels) == 1
        assert int(vd.num_points_per_voxel[0]) == 8

    def test_matches_numpy_grouping(self, rng):
        pts = rng.uniform(-2, 2, (400, 3)).astype(np.float32)
        vsize = (0.5, 0.5, 0.5)
        vd = ops.voxelize(jnp.asarray(pts), vsize, (-2, -2, -2), (2, 2, 2),
                          max_voxels=512, max_points_per_voxel=64)
        coords_np = np.floor((pts + 2) / 0.5).astype(np.int64)
        uniq = np.unique(coords_np, axis=0)
        assert int(vd.num_voxels) == len(uniq)
        got = np.asarray(vd.coords)[np.asarray(vd.voxel_mask)]
        assert set(map(tuple, got)) == set(map(tuple, uniq))


class TestCanvasMajorPillars:
    """pillar_mode='canvas' (segment-max writes the BEV canvas directly)
    must reproduce pillar_mode='compact' (sort-based voxelize + compact
    pillars + scatter) through the FULL PointPillars net when neither the
    per-pillar point cap nor the max_voxels cap binds — the two documented
    semantic deltas of the canvas path."""

    def _net(self, mode):
        from open3d_ml_tpu.models.point_pillars import PointPillarsNet
        pc = (0.0, -6.4, -3.0, 12.8, 6.4, 1.0)
        return PointPillarsNet(
            classes=("Car",), point_cloud_range=pc,
            voxel_size=(0.4, 0.4, 4.0), max_num_points=32,
            max_voxels=1024,
            feat_channels=(16,), output_shape=(32, 32),
            backbone={"in_channels": 16, "out_channels": (16, 32),
                      "layer_nums": (1, 1), "layer_strides": (2, 2)},
            neck={"in_channels": (16, 32), "out_channels": (16, 16),
                  "upsample_strides": (1, 2)},
            head={"ranges": [list(pc)], "sizes": [[1.6, 3.9, 1.56]],
                  "rotations": [0, 1.5707963]},
            compute_dtype="float32", pillar_mode=mode)

    def test_canvas_equals_compact(self, rng):
        import jax
        b, p, n_real = 2, 1024, 800
        pts = np.zeros((b, p, 4), np.float32)
        pts[:, :n_real, 0] = rng.uniform(0, 12.7, (b, n_real))
        pts[:, :n_real, 1] = rng.uniform(-6.3, 6.3, (b, n_real))
        pts[:, :n_real, 2] = rng.uniform(-3, 1, (b, n_real))
        pts[:, :n_real, 3] = rng.uniform(0, 1, (b, n_real))
        batch = {"point": jnp.asarray(pts),
                 "point_count": jnp.full((b,), n_real, jnp.int32)}
        canvas_net = self._net("canvas")
        compact_net = self._net("compact")
        v = canvas_net.init({"params": jax.random.PRNGKey(0)}, batch,
                            training=False)
        out_a = canvas_net.apply(v, batch, training=False)
        out_b = compact_net.apply(v, batch, training=False)
        for a, bb in zip(out_a, out_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-5)

    def test_compact_cap_binding_matches_reference_semantics(self, rng):
        """When a pillar holds more than max_num_points points, the
        reference keeps only the FIRST max_num_points (in point order) in
        its dense [V, P] buffer — later points are invisible to the PFN
        (reference point_pillars.py:299-382). 'compact' must reproduce
        that: its output on the full cloud equals the net run on a
        host-pre-capped cloud. 'canvas' pools ALL points (documented
        delta), so it must differ here — which is why get_eval_net pins
        eval to 'compact'."""
        import jax
        b, p = 1, 256
        n_real, n_hot = 200, 80  # 80 of the points pile into ONE pillar
        pts = np.zeros((b, p, 4), np.float32)
        pts[:, :n_real, 0] = rng.uniform(0, 12.7, (b, n_real))
        pts[:, :n_real, 1] = rng.uniform(-6.3, 6.3, (b, n_real))
        pts[:, :n_real, 2] = rng.uniform(-3, 1, (b, n_real))
        pts[:, :n_real, 3] = rng.uniform(0, 1, (b, n_real))
        # hot pillar: cell x in [4.0, 4.4), y in [0.0, 0.4)
        pts[:, :n_hot, 0] = rng.uniform(4.01, 4.39, (b, n_hot))
        pts[:, :n_hot, 1] = rng.uniform(0.01, 0.39, (b, n_hot))

        # host-side reference cap: first max_num_points per pillar
        # (in original point order), rest dropped
        cap = 32
        capped = pts.copy()
        counts = {}
        keep = np.ones(n_real, bool)
        for i in range(n_real):
            cell = (int((pts[0, i, 0]) / 0.4), int((pts[0, i, 1] + 6.4)
                                                   / 0.4))
            counts[cell] = counts.get(cell, 0) + 1
            if counts[cell] > cap:
                keep[i] = False
        kept = pts[0, :n_real][keep]
        capped[:] = 0
        capped[0, :len(kept)] = kept

        batch_full = {"point": jnp.asarray(pts),
                      "point_count": jnp.full((b,), n_real, jnp.int32)}
        batch_cap = {"point": jnp.asarray(capped),
                     "point_count": jnp.full((b,), len(kept), jnp.int32)}
        assert len(kept) < n_real  # the cap really binds

        canvas_net = self._net("canvas")
        compact_net = self._net("compact")
        v = canvas_net.init({"params": jax.random.PRNGKey(0)}, batch_full,
                            training=False)
        out_compact_full = compact_net.apply(v, batch_full, training=False)
        out_canvas_cap = canvas_net.apply(v, batch_cap, training=False)
        out_canvas_full = canvas_net.apply(v, batch_full, training=False)
        # compact(full) == any-mode(pre-capped): reference cap semantics
        for a, bb in zip(out_compact_full, out_canvas_cap):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-5)
        # canvas(full) sees the capped-out points -> must differ
        deltas = [float(np.abs(np.asarray(a) - np.asarray(bb)).max())
                  for a, bb in zip(out_canvas_full, out_compact_full)]
        assert max(deltas) > 1e-4, deltas


class TestSampling:

    def test_fps_first_index_and_spread(self, rng):
        pts = rng.standard_normal((128, 3)).astype(np.float32)
        idx = np.asarray(ops.furthest_point_sampling(jnp.asarray(pts), 16))
        assert idx[0] == 0
        assert len(np.unique(idx)) == 16
        # greedy property: second point is the farthest from point 0
        d = np.linalg.norm(pts - pts[0], axis=1)
        assert idx[1] == int(np.argmax(d))

    def test_fps_numpy_reference(self, rng):
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        k = 10
        got = np.asarray(ops.furthest_point_sampling(jnp.asarray(pts), k))
        # numpy reference implementation
        sel = [0]
        dist = np.full(64, np.inf)
        for _ in range(k - 1):
            d = np.sum((pts - pts[sel[-1]])**2, axis=1)
            dist = np.minimum(dist, d)
            sel.append(int(np.argmax(dist)))
        np.testing.assert_array_equal(got, sel)

    def test_fps_mask(self, rng):
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:20] = True
        idx = np.asarray(
            ops.furthest_point_sampling(jnp.asarray(pts), 8,
                                        points_mask=jnp.asarray(mask)))
        assert idx.max() < 20


class TestInterpolation:

    def test_three_nn_interpolate(self, rng):
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        q = rng.standard_normal((20, 3)).astype(np.float32)
        feats = rng.standard_normal((50, 8)).astype(np.float32)
        dist, idx = ops.three_nn(jnp.asarray(q), jnp.asarray(pts))
        w = ops.inverse_distance_weights(dist)
        out = ops.three_interpolate(jnp.asarray(feats), idx, w)
        tree = cKDTree(pts)
        rd, ri = tree.query(q, k=3)
        rw = (1 / (rd + 1e-8))
        rw = rw / rw.sum(axis=1, keepdims=True)
        ref = (feats[ri] * rw[..., None]).sum(axis=1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_trilinear_devoxelize_exact_at_corners(self, rng):
        r = 4
        grid = rng.standard_normal((6, r, r, r)).astype(np.float32)
        # query exactly at integer voxel coords
        ii, jj, kk = np.meshgrid(range(r), range(r), range(r), indexing="ij")
        coords = np.stack([ii.ravel(), jj.ravel(), kk.ravel()]).astype(
            np.float32)
        out = ops.trilinear_devoxelize(jnp.asarray(grid), jnp.asarray(coords),
                                       r)
        ref = grid.reshape(6, -1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_trilinear_devoxelize_grad(self, rng):
        r = 4
        grid = jnp.asarray(rng.standard_normal((2, r, r, r)), jnp.float32)
        coords = jnp.asarray(rng.uniform(0, r - 1, (3, 10)), jnp.float32)
        g = jax.grad(
            lambda g_: ops.trilinear_devoxelize(g_, coords, r).sum())(grid)
        assert g.shape == grid.shape
        assert bool(jnp.isfinite(g).all())


class TestSubsample:

    def test_barycenters(self):
        pts = np.array([[0.1, 0, 0], [0.3, 0, 0], [2.0, 0, 0]], np.float32)
        sub = ops.grid_subsampling(pts, grid_size=1.0)
        assert sub.shape[0] == 2
        sub = sub[np.argsort(sub[:, 0])]
        np.testing.assert_allclose(sub[0], [0.2, 0, 0], atol=1e-6)
        np.testing.assert_allclose(sub[1], [2.0, 0, 0], atol=1e-6)

    def test_features_and_labels(self, rng):
        pts = rng.uniform(0, 4, (200, 3)).astype(np.float32)
        feats = rng.standard_normal((200, 5)).astype(np.float32)
        labels = rng.integers(0, 10, 200).astype(np.int32)
        sp, sf, sl = ops.grid_subsampling(pts, features=feats, labels=labels,
                                          grid_size=1.0)
        assert sp.shape[0] == sf.shape[0] == sl.shape[0]
        assert sl.dtype == np.int32
        # every sub point must be inside the cloud bounding box
        assert (sp >= pts.min(0) - 1e-5).all()
        assert (sp <= pts.max(0) + 1e-5).all()

    def test_majority_label(self):
        pts = np.zeros((5, 3), np.float32)
        labels = np.array([1, 1, 1, 2, 2], np.int32)
        _, sl = ops.grid_subsampling(pts, labels=labels, grid_size=1.0)
        assert sl[0] == 1

    def test_batch(self, rng):
        pts = rng.uniform(0, 2, (100, 3)).astype(np.float32)
        rs = np.array([0, 40, 100], np.int64)
        sp, srs = ops.grid_subsampling_batch(pts, rs, grid_size=0.5)
        assert srs[0] == 0 and srs[-1] == sp.shape[0]
        assert len(srs) == 3


class TestIoU:

    def test_aligned_boxes_match_shapely_free_reference(self):
        # axis-aligned rotated boxes: IoU has a closed form
        b1 = np.array([[0, 0, 2, 2, 0.0]], np.float32)
        b2 = np.array([[1, 1, 2, 2, 0.0]], np.float32)
        iou = ops.iou_bev(b1, b2)
        np.testing.assert_allclose(iou[0, 0], 1.0 / 7.0, atol=1e-5)

    def test_identical_box(self):
        b = np.array([[1.0, 2.0, 3.0, 4.0, 0.7]], np.float32)
        np.testing.assert_allclose(ops.iou_bev(b, b)[0, 0], 1.0, atol=1e-5)

    def test_rotated_45(self):
        # unit square vs itself rotated 45deg about same center:
        # intersection is a regular octagon, area = 2*(sqrt(2)-1)
        b1 = np.array([[0, 0, 1, 1, 0.0]], np.float32)
        b2 = np.array([[0, 0, 1, 1, np.pi / 4]], np.float32)
        inter = 2 * (np.sqrt(2) - 1)
        expect = inter / (2 - inter)
        np.testing.assert_allclose(ops.iou_bev(b1, b2)[0, 0], expect,
                                   atol=1e-4)

    def test_disjoint(self):
        b1 = np.array([[0, 0, 1, 1, 0.3]], np.float32)
        b2 = np.array([[10, 10, 1, 1, 1.0]], np.float32)
        np.testing.assert_allclose(ops.iou_bev(b1, b2)[0, 0], 0.0, atol=1e-6)

    def test_jax_matches_numpy(self, rng):
        b1 = rng.uniform(-1, 1, (8, 5)).astype(np.float32)
        b2 = rng.uniform(-1, 1, (6, 5)).astype(np.float32)
        b1[:, 2:4] = rng.uniform(0.5, 2, (8, 2))
        b2[:, 2:4] = rng.uniform(0.5, 2, (6, 2))
        ref = ops.iou_bev(b1, b2, xp=np)
        got = ops.iou_bev(jnp.asarray(b1), jnp.asarray(b2), xp=jnp)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    def test_iou3d_vertical_overlap(self):
        # same bev footprint, half vertical overlap
        b1 = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
        b2 = np.array([[0, 1, 0, 2, 2, 2, 0.0]], np.float32)
        iou = ops.iou_3d(b1, b2)
        np.testing.assert_allclose(iou[0, 0], (4 * 2 * 0.5) / (8 + 8 - 4),
                                   atol=1e-5)


class TestNMS:

    def test_suppression(self):
        boxes = jnp.asarray(np.array([
            [0, 0, 2, 2, 0.0],
            [0.1, 0.1, 2, 2, 0.0],  # heavy overlap with 0
            [5, 5, 2, 2, 0.0],
        ], np.float32))
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep = ops.nms_bev(boxes, scores, 0.5)
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True])

    def test_score_order_decides_survivor(self):
        boxes = jnp.asarray(np.array([
            [0, 0, 2, 2, 0.0],
            [0.1, 0.1, 2, 2, 0.0],
        ], np.float32))
        keep = ops.nms_bev(boxes, jnp.asarray([0.5, 0.9]), 0.5)
        np.testing.assert_array_equal(np.asarray(keep), [False, True])

    def test_multiclass(self):
        boxes = jnp.asarray(np.array([
            [0, 0, 2, 2, 0.0],
            [0.1, 0.1, 2, 2, 0.0],
        ], np.float32))
        scores = jnp.asarray(np.array([[0.9, 0.1], [0.2, 0.8]], np.float32))
        keep = ops.multiclass_nms(boxes, scores, iou_threshold=0.5,
                                  score_threshold=0.05)
        np.testing.assert_array_equal(np.asarray(keep),
                                      [[True, False], [False, True]])


class TestMortonWindowKNN:
    """Morton-curve window KNN (ops/morton.py): the gather-free approximate
    neighbor path for the on-device pyramid."""

    def _cloud(self, n=8192, seed=0):
        rng = np.random.default_rng(seed)
        r = rng.uniform(2, 50, n) ** 1.5 / 50 ** 0.5
        theta = rng.uniform(0, 2 * np.pi, n)
        z = rng.uniform(-2, 1, n) + 0.05 * r
        return np.stack([r * np.cos(theta), r * np.sin(theta), z],
                        1).astype(np.float32)

    def test_morton_codes_order_locality(self):
        from open3d_ml_tpu.ops.morton import morton_codes
        pts = jnp.asarray(self._cloud(2048))
        codes = morton_codes(pts)
        assert codes.shape == (2048,)
        assert int(jnp.min(codes)) >= 0
        # sorted-by-code neighbors are spatially close on average: mean
        # consecutive distance far below the random-pair expectation
        order = jnp.argsort(codes)
        sp = np.asarray(pts[order])
        consec = np.linalg.norm(np.diff(sp, axis=0), axis=1).mean()
        rng = np.random.default_rng(0)
        rand_pairs = np.linalg.norm(
            sp[rng.integers(0, 2048, 512)] - sp[rng.integers(0, 2048, 512)],
            axis=1).mean()
        assert consec < 0.25 * rand_pairs

    def test_self_knn_recall(self):
        from open3d_ml_tpu.ops.morton import knn_window
        from open3d_ml_tpu.ops.neighbors import knn_search
        pts = jnp.asarray(self._cloud(8192))
        ei, ed = knn_search(pts, pts, 16)
        wi, wd = jax.jit(
            lambda p: knn_window(p, p, 16, window=128, n_curves=3))(pts)
        ed, wd = np.asarray(ed), np.asarray(wd)
        recall = np.mean(wd <= ed[:, -1:] + 1e-9)
        assert recall > 0.96, recall
        # self point is always its own nearest neighbor
        np.testing.assert_array_equal(np.asarray(wi)[:, 0],
                                      np.arange(8192))

    def test_cross_knn_and_mask(self):
        from open3d_ml_tpu.ops.morton import knn_window
        pts = jnp.asarray(self._cloud(4096, seed=1))
        sub = pts[:1024]
        mask = np.ones(1024, bool)
        mask[500:] = False  # only the first 500 sub points are valid
        wi, wd = knn_window(sub, pts, 1, window=128, n_curves=2,
                            points_mask=jnp.asarray(mask))
        assert int(jnp.max(wi)) < 500
        assert bool(jnp.all(jnp.isfinite(wd)))

    def test_merge_dedup(self):
        from open3d_ml_tpu.ops.morton import _merge_topk
        # two curve lists sharing ids must not report a duplicate id twice
        idx1 = jnp.asarray([[3, 7, 9]])
        d1 = jnp.asarray([[0.1, 0.2, 0.3]])
        idx2 = jnp.asarray([[3, 5, 9]])
        d2 = jnp.asarray([[0.1, 0.15, 0.3]])
        mi, md = _merge_topk([idx1, idx2], [d1, d2], 4)
        ids = np.asarray(mi)[0]
        assert len(set(ids.tolist())) == 4
        np.testing.assert_allclose(np.sort(np.asarray(md)[0]),
                                   [0.1, 0.15, 0.2, 0.3])

    def test_pyramid_window_method(self):
        from open3d_ml_tpu.ops.neighbors import build_knn_pyramid
        pts = jnp.asarray(self._cloud(4096, seed=2))
        pyr = jax.jit(lambda p: build_knn_pyramid(
            p, 8, [4, 4], method="window"))(pts)
        assert pyr["neighbor_indices"][0].shape == (4096, 8)
        assert pyr["neighbor_indices"][1].shape == (1024, 8)
        assert pyr["sub_idx"][0].shape == (1024, 8)
        assert pyr["interp_idx"][0].shape == (4096, 1)
        assert int(jnp.max(pyr["neighbor_indices"][0])) < 4096
