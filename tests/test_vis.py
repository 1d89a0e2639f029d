"""Visualizer tests: headless PLY-export backend, LUT colorization, box
linesets (reference ml3d/vis/)."""

import numpy as np


class TestVisualizer:

    def _data(self, n=200, seed=0):
        rng = np.random.default_rng(seed)
        return [{
            "name": "cloud_a",
            "points": rng.uniform(0, 5, (n, 3)).astype(np.float32),
            "labels": rng.integers(0, 3, n).astype(np.int32),
        }]

    def test_export_with_lut(self, tmp_path):
        from open3d_ml_tpu.vis import LabelLUT, Visualizer

        v = Visualizer()
        lut = LabelLUT()
        for val, name in enumerate(["road", "car", "person"]):
            lut.add_label(name, val)
        files = v.visualize(self._data(), lut=lut,
                            out_dir=str(tmp_path / "out"))
        # headless environment -> PLY export path
        if files is not None:
            assert len(files) == 1
            from open3d_ml_tpu.datasets.utils.ply import read_ply
            ply = read_ply(files[0])
            assert ply["x"].shape == (200,)
            assert ply["red"].dtype == np.uint8
            # three label classes -> at least two distinct colors
            cols = np.stack([ply["red"], ply["green"], ply["blue"]], 1)
            assert len(np.unique(cols, axis=0)) >= 2

    def test_export_scalar_shading(self, tmp_path):
        from open3d_ml_tpu.vis import Visualizer

        rng = np.random.default_rng(1)
        data = [{
            "name": "cloud_b",
            "points": rng.uniform(0, 5, (100, 3)).astype(np.float32),
            "intensity": rng.uniform(0, 1, 100).astype(np.float32),
        }]
        files = Visualizer().visualize(data, out_dir=str(tmp_path / "out"))
        if files is not None:
            assert len(files) == 1

    def test_boxes_export(self, tmp_path):
        from open3d_ml_tpu.datasets.utils import BEVBox3D
        from open3d_ml_tpu.vis import Visualizer

        box = BEVBox3D(center=np.array([1.0, 2.0, 0.5]),
                       size=np.array([1.6, 1.5, 3.9]), yaw=0.3,
                       label_class="Car", confidence=0.9)
        files = Visualizer().visualize(self._data(), bounding_boxes=[box],
                                       out_dir=str(tmp_path / "out"))
        if files is not None:
            assert len(files) == 2  # cloud + box lineset

    def test_colormap(self):
        from open3d_ml_tpu.vis import Colormap

        cm = Colormap.make_rainbow()
        cols = cm.calc_color_array(np.linspace(0, 1, 16), 0.0, 1.0)
        assert cols.shape == (16, 3)
        assert cols.min() >= 0.0 and cols.max() <= 1.0
        grey = Colormap.make_greyscale()
        g = grey.calc_color_array(np.asarray([0.0, 1.0]), 0.0, 1.0)
        np.testing.assert_allclose(g[0], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(g[1], [1, 1, 1], atol=1e-6)
