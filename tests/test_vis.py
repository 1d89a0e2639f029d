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
            assert len(files) == 2  # cloud + index.html
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
            assert len(files) == 2  # cloud + index.html

    def test_boxes_export(self, tmp_path):
        from open3d_ml_tpu.datasets.utils import BEVBox3D
        from open3d_ml_tpu.vis import Visualizer

        box = BEVBox3D(center=np.array([1.0, 2.0, 0.5]),
                       size=np.array([1.6, 1.5, 3.9]), yaw=0.3,
                       label_class="Car", confidence=0.9)
        files = Visualizer().visualize(self._data(), bounding_boxes=[box],
                                       out_dir=str(tmp_path / "out"))
        if files is not None:
            assert len(files) == 3  # cloud + box lineset + index.html

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


class TestHtmlViewer:
    """Interactive single-file HTML viewer (vis/html_export.py) — the
    headless counterpart of the reference GUI app
    (reference visualizer.py:416-1750)."""

    def _export(self, tmp_path, with_boxes=True):
        from open3d_ml_tpu.vis import LabelLUT, Visualizer
        from open3d_ml_tpu.datasets.utils import BEVBox3D
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 10, (500, 3)).astype(np.float32)
        labels = np.digitize(pts[:, 2], [3, 6]).astype(np.int32)
        boxes = [BEVBox3D(center=[5, 5, 1], size=[1.5, 1.5, 3], yaw=0.4,
                          label_class="Car", confidence=1.0)] \
            if with_boxes else None
        out = Visualizer().visualize(
            [{"name": "a", "points": pts, "labels": labels},
             {"name": "b", "points": pts + 1.0, "labels": labels}],
            lut=LabelLUT({0: "low", 1: "mid", 2: "high"}),
            bounding_boxes=boxes, out_dir=str(tmp_path))
        return out

    def test_written_files(self, tmp_path):
        out = self._export(tmp_path)
        names = [p.split("/")[-1] for p in out]
        assert "index.html" in names
        assert "a.ply" in names and "b.ply" in names

    def test_html_payload_roundtrip(self, tmp_path):
        """The embedded base64 payload decodes to the exported geometry and
        the UI scaffolding (cloud list, shading selector, animation,
        WebGL2 shaders) is present."""
        import base64
        import json
        import re
        self._export(tmp_path)
        html = (tmp_path / "index.html").read_text()
        for needle in ("webgl2", "getElementById('clouds')",
                       "id=\"attr\"", "id=\"play\"", "gl.POINTS",
                       "gl.LINES", "layout(location=0)"):
            assert needle in html, needle
        data = json.loads(re.search(r"const DATA = (\{.*?\});\n",
                                    html).group(1))
        assert [c["name"] for c in data["clouds"]] == ["a", "b"]
        pos = np.frombuffer(base64.b64decode(data["clouds"][0]["pos"]),
                            np.float32)
        assert pos.shape[0] == 500 * 3
        assert np.isfinite(pos).all()
        # per-cloud label shading present with one color triple per point
        col = np.frombuffer(
            base64.b64decode(data["clouds"][0]["colors"]["labels"]),
            np.float32)
        assert col.shape[0] == 500 * 3
        assert len(data["boxes"]) == 1
        bpos = np.frombuffer(base64.b64decode(data["boxes"][0]["pos"]),
                             np.float32).reshape(-1, 3)
        bcol = np.frombuffer(base64.b64decode(data["boxes"][0]["col"]),
                             np.float32).reshape(-1, 3)
        assert bpos.shape == bcol.shape and bpos.shape[0] % 2 == 0
