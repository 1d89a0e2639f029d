"""Point cloud / prediction visualizer.

Rebuild of /root/reference/ml3d/vis/visualizer.py:18-1750 for a headless
TPU-first environment: the same data contract — lists of dicts with 'name',
'points' and per-point attributes, or (dataset, split, indices) — and the
same Model/DataModel/DatasetModel structure, but rendering goes through one
of two backends:

* the Open3D GUI when `open3d` is importable (parity with the reference),
* otherwise colored-PLY export per cloud (+ bounding-box linesets), which
  any external viewer (Open3D, MeshLab, CloudCompare) opens directly.
"""

import logging
from os.path import join

import numpy as np

from ..utils import make_dir
from .boundingbox import BoundingBox3D
from .colormap import Colormap
from .labellut import LabelLUT

log = logging.getLogger(__name__)


class Model:
    """Manages the clouds and per-point attributes to visualize
    (reference visualizer.py:18-266)."""

    bounding_box_prefix = "Bounding Boxes/"

    def __init__(self):
        self._data = {}  # name -> {attr: array}
        self._attr2minmax = {}
        self.bounding_box_data = {}  # name -> [BoundingBox3D]
        self.data_names = []

    def _init_data(self, name):
        self._data[name] = {}
        self.data_names.append(name)

    def is_loaded(self, name):
        return name in self._data and len(self._data[name]) > 0

    def load(self, name, fail_if_no_space=False):
        pass  # eager in the base Model

    def unload(self, name):
        pass

    def create_point_cloud(self, data):
        """Normalize a user data dict into the internal attribute map."""
        assert "name" in data and "points" in data
        out = {"points": np.asarray(data["points"], np.float32)}
        n = out["points"].shape[0]
        for k, v in data.items():
            if k in ("name", "points"):
                continue
            if v is None:
                continue
            v = np.asarray(v)
            if v.ndim and v.shape[0] == n:
                out[k] = v
        return out

    def get_attr(self, name, attr_name):
        return self._data.get(name, {}).get(attr_name)

    def get_attr_shape(self, name, attr_name):
        attr = self.get_attr(name, attr_name)
        return list(attr.shape) if attr is not None else []

    def get_attr_minmax(self, attr_name, channel=0):
        key = f"{attr_name}:{channel}"
        if key not in self._attr2minmax:
            mins, maxs = [], []
            for data in self._data.values():
                attr = data.get(attr_name)
                if attr is None:
                    continue
                a = attr if attr.ndim == 1 else attr[:, channel]
                mins.append(float(a.min()))
                maxs.append(float(a.max()))
            self._attr2minmax[key] = (min(mins) if mins else 0.0,
                                      max(maxs) if maxs else 1.0)
        return self._attr2minmax[key]

    def get_available_attrs(self, names):
        attrs = None
        for n in names:
            keys = {k for k in self._data.get(n, {}) if k != "points"}
            attrs = keys if attrs is None else attrs & keys
        return sorted(attrs or [])


class DataModel(Model):
    """Model backed by user-provided in-memory dicts
    (reference visualizer.py:221-266)."""

    def __init__(self, userdata):
        super().__init__()
        for d in userdata:
            name = d["name"]
            self._init_data(name)
            self._data[name] = self.create_point_cloud(d)
            if "bounding_boxes" in d and d["bounding_boxes"]:
                self.bounding_box_data[
                    self.bounding_box_prefix + name] = d["bounding_boxes"]


class DatasetModel(Model):
    """Model backed by a dataset split with lazy loading
    (reference visualizer.py:267-414)."""

    def __init__(self, dataset, split, indices):
        super().__init__()
        self._dataset_split = dataset.get_split(split)
        if indices == "all" or indices is None:
            indices = range(len(self._dataset_split))
        self._indices = list(indices)
        for i in self._indices:
            attr = self._dataset_split.get_attr(i)
            self._init_data(attr["name"])
        self._name2index = {
            self._dataset_split.get_attr(i)["name"]: i
            for i in self._indices
        }

    def load(self, name, fail_if_no_space=False):
        if self.is_loaded(name):
            return True
        idx = self._name2index[name]
        raw = self._dataset_split.get_data(idx)
        d = {"name": name, "points": raw["point"]}
        if raw.get("feat") is not None:
            d["feat"] = raw["feat"]
        if raw.get("label") is not None:
            d["labels"] = raw["label"]
        if raw.get("intensity") is not None:
            d["intensity"] = raw["intensity"]
        self._data[name] = self.create_point_cloud(d)
        if raw.get("bounding_boxes"):
            self.bounding_box_data[self.bounding_box_prefix + name] = \
                raw["bounding_boxes"]
        return True


class Visualizer:
    """Dataset/prediction visualizer with GUI and export backends."""

    def __init__(self):
        self._model = None
        self.lut = None

    def set_lut(self, attr_name, lut):
        self.lut = (attr_name, lut)

    # --------------------------------------------------------------- public

    def visualize_dataset(self, dataset, split, indices=None, width=1024,
                          height=768, out_dir="./vis_export"):
        """Visualize clouds from a dataset split (reference :1661-1693)."""
        self._model = DatasetModel(dataset, split, indices)
        lut = LabelLUT(getattr(dataset, "label_to_names", None))
        self.set_lut("labels", lut)
        return self._show(width, height, out_dir)

    def visualize(self, data, lut=None, bounding_boxes=None, width=1024,
                  height=768, out_dir="./vis_export"):
        """Visualize a list of data dicts (reference :1694-1750)."""
        self._model = DataModel(data)
        if bounding_boxes:
            self._model.bounding_box_data["Bounding Boxes/custom"] = \
                bounding_boxes
        if lut is not None:
            self.set_lut("labels", lut)
        return self._show(width, height, out_dir)

    # -------------------------------------------------------------- backend

    def _colorize(self, name):
        """Per-point colors for one cloud using the LUT or rainbow map."""
        model = self._model
        model.load(name)
        pts = model.get_attr(name, "points")
        n = pts.shape[0]
        colors = np.full((n, 3), 0.8, np.float32)
        if self.lut is not None:
            attr_name, lut = self.lut
            labels = model.get_attr(name, attr_name)
            if labels is not None and isinstance(lut, LabelLUT):
                for val, label in lut.labels.items():
                    colors[np.asarray(labels).reshape(-1) == val] = \
                        label.color
                return pts, colors
        for attr_name in ("feat", "intensity"):
            attr = model.get_attr(name, attr_name)
            if attr is not None:
                a = attr if attr.ndim == 1 else attr[:, 0]
                lo, hi = float(a.min()), float(a.max())
                cm = Colormap.make_rainbow()
                colors = cm.calc_color_array(a, lo, hi).astype(np.float32)
                break
        return pts, colors

    def _show(self, width, height, out_dir):
        try:
            import open3d  # noqa: F401
            return self._show_gui(width, height)
        except ImportError:
            return self._export(out_dir)

    def _show_gui(self, width, height):  # pragma: no cover - needs GUI
        import open3d as o3d
        geoms = []
        for name in self._model.data_names:
            pts, colors = self._colorize(name)
            pc = o3d.geometry.PointCloud()
            pc.points = o3d.utility.Vector3dVector(pts.astype(np.float64))
            pc.colors = o3d.utility.Vector3dVector(colors.astype(np.float64))
            geoms.append(pc)
        for name, boxes in self._model.bounding_box_data.items():
            geoms.append(BoundingBox3D.create_lines(boxes,
                                                    out_format="lineset"))
        o3d.visualization.draw_geometries(geoms, width=width, height=height)
        return None

    def _export(self, out_dir):
        """Headless backend: colored PLY files, box linesets, and the
        interactive single-file HTML viewer (html_export.export_html) —
        dataset browsing/shading/animation without the Open3D GUI."""
        from ..datasets.utils.ply import write_ply
        from .html_export import export_html
        make_dir(out_dir)
        written = []
        html_clouds = []
        for name in self._model.data_names:
            pts, colors = self._colorize(name)
            safe = name.replace("/", "_")
            path = join(out_dir, f"{safe}.ply")
            rgb = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
            write_ply(path, [pts, rgb],
                      ["x", "y", "z", "red", "green", "blue"])
            written.append(path)
            shadings = {"labels" if self.lut is not None else "color":
                        np.clip(colors, 0, 1)}
            for attr_name in ("feat", "intensity"):
                attr = self._model.get_attr(name, attr_name)
                if attr is not None:
                    a = np.asarray(attr)
                    a = a if a.ndim == 1 else a[:, 0]
                    lo, hi = float(a.min()), float(a.max() or 1.0)
                    cm = Colormap.make_rainbow()
                    shadings[attr_name] = np.clip(
                        cm.calc_color_array(a, lo, hi), 0, 1)
            html_clouds.append({"name": name, "points": pts,
                                "colors": shadings})
        html_boxes = []
        for name, boxes in self._model.bounding_box_data.items():
            lines = BoundingBox3D.create_lines(boxes, out_format="dict")
            safe = name.replace("/", "_")
            path = join(out_dir, f"{safe}_boxes.ply")
            v = lines["vertex_positions"]
            write_ply(path, [v], ["x", "y", "z"])
            np.save(join(out_dir, f"{safe}_box_lines.npy"),
                    lines["line_indices"])
            written.append(path)
            idx = np.asarray(lines["line_indices"]).reshape(-1)
            cols = lines.get("line_colors")
            if cols is None:
                cols = np.full((len(idx) // 2, 3), [1.0, 0.8, 0.2])
            html_boxes.append({
                "vertex_positions": np.asarray(v)[idx],
                "line_colors": np.repeat(np.asarray(cols), 2, axis=0)})
        written.append(export_html(html_clouds, out_dir, boxes=html_boxes))
        log.info(f"Visualizer: exported {len(written)} files to {out_dir}")
        return written


def visualize_dataset(dataset, split, indices=None, **kwargs):
    return Visualizer().visualize_dataset(dataset, split, indices, **kwargs)
