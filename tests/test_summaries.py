"""3D TensorBoard summary tests (pipelines/summaries.py; reference
get_3d_summary semantic_segmentation.py:482-618)."""

import numpy as np


class _FakeWriter:

    def __init__(self):
        self.meshes = []

    def add_mesh(self, tag, vertices=None, colors=None, global_step=0):
        self.meshes.append((tag, np.asarray(vertices),
                            None if colors is None else np.asarray(colors),
                            global_step))


class TestSummaries:

    def test_pointcloud_summary_colors(self):
        from open3d_ml_tpu.pipelines.summaries import add_pointcloud_summary
        from open3d_ml_tpu.vis import LabelLUT

        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 5, (2, 100, 3)).astype(np.float32)
        labels = rng.integers(0, 2, (2, 100))
        lut = LabelLUT({0: "a", 1: "b"})
        w = _FakeWriter()
        add_pointcloud_summary(w, "train", pts, labels, lut,
                               max_outputs=2)
        assert len(w.meshes) == 2
        tag, v, c, _ = w.meshes[0]
        assert v.shape == (1, 100, 3)
        assert c.shape == (1, 100, 3)
        assert len(np.unique(c.reshape(-1, 3), axis=0)) >= 2

    def test_max_pts_subsampling(self):
        from open3d_ml_tpu.pipelines.summaries import add_pointcloud_summary

        pts = np.zeros((500, 3), np.float32)
        w = _FakeWriter()
        add_pointcloud_summary(w, "t", pts, max_pts=50)
        assert w.meshes[0][1].shape == (1, 50, 3)

    def test_record_summary_gating(self):
        from open3d_ml_tpu.pipelines.summaries import record_summary

        w = _FakeWriter()
        data = {"point": np.zeros((10, 3), np.float32)}
        record_summary(w, {"record_for": []}, "train", "x", data, None, 0)
        assert not w.meshes  # split not recorded
        record_summary(w, {"record_for": ["train"]}, "train", "x", data,
                       None, 0)
        assert len(w.meshes) == 1

    def test_boxes_summary(self):
        from open3d_ml_tpu.datasets.utils import BEVBox3D
        from open3d_ml_tpu.pipelines.summaries import add_boxes_summary

        box = BEVBox3D(center=np.array([0.0, 0.0, 0.0]),
                       size=np.array([1.0, 1.0, 2.0]), yaw=0.0,
                       label_class="Car", confidence=1.0)
        w = _FakeWriter()
        add_boxes_summary(w, "boxes", [box])
        assert len(w.meshes) == 1
        assert w.meshes[0][1].shape[-1] == 3
