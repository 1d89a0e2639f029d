"""Host-side point cloud augmentation (numpy, runs in the input pipeline).

Rebuild of /root/reference/ml3d/datasets/augment/augmentation.py:9-595 —
geometric base augments (recenter/normalize/rotate/scale/noise), semantic-
segmentation extras (dropout, flips, chromatic transforms), and object-
detection extras (PointShuffle, ObjectRangeFilter, ObjectSample gt paste-in).
Augmentation is host work by design: it changes per-sample and would defeat
XLA caching on device.
"""

import pickle
import warnings

import numpy as np


def _rotation_matrices(axes, angles):
    """Rotation matrices [N,3,3] about unit axes [N,3] by angles [N]."""
    axes = np.asarray(axes, np.float64).reshape(-1, 3)
    angles = np.asarray(angles, np.float64).reshape(-1)
    c = np.cos(angles)
    s = np.sin(angles)
    t = 1 - c
    x, y, z = axes[:, 0], axes[:, 1], axes[:, 2]
    R = np.stack([
        t * x * x + c, t * x * y - s * z, t * x * z + s * y,
        t * x * y + s * z, t * y * y + c, t * y * z - s * x,
        t * x * z - s * y, t * y * z + s * x, t * z * z + c
    ], axis=-1).reshape(-1, 3, 3)
    return R.astype(np.float32)


class Augmentation:
    """Common augmentation methods shared by both task pipelines."""

    def __init__(self, cfg, seed=None):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)

    def recenter(self, data, cfg):
        if not cfg:
            return data
        dim = cfg.get("dim", [0, 1, 2])
        data[:, dim] = data[:, dim] - data.mean(0)[dim]
        return data

    def normalize(self, pc, feat, cfg):
        if "points" in cfg:
            method = cfg["points"].get("method", "linear")
            if method != "linear":
                raise ValueError(f"Unsupported normalize method: {method}")
            pc -= pc.mean(0)
            pc /= (pc.max(0) - pc.min(0)).max()
        if "feat" in cfg and feat is not None:
            cfg_f = cfg["feat"]
            if cfg_f.get("method", "linear") != "linear":
                raise ValueError("Unsupported feat normalize method")
            feat -= cfg_f.get("bias", 0)
            feat /= cfg_f.get("scale", 1)
        return pc, feat

    def rotate(self, pc, cfg):
        if np.abs(pc[:, :2].mean()) > 1e-2:
            warnings.warn("Recenter pointcloud before calling rotate.")
        method = cfg.get("method", "vertical")
        if method == "vertical":
            theta = self.rng.random() * 2 * np.pi
            c, s = np.cos(theta), np.sin(theta)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        elif method == "all":
            theta = self.rng.random() * 2 * np.pi
            phi = (self.rng.random() - 0.5) * np.pi
            u = np.array([
                np.cos(theta) * np.cos(phi),
                np.sin(theta) * np.cos(phi),
                np.sin(phi)
            ])
            alpha = self.rng.random() * 2 * np.pi
            R = _rotation_matrices(u, alpha)[0]
        else:
            raise ValueError(f"Unsupported rotate method: {method}")
        return np.matmul(pc, R.astype(np.float32))

    def scale(self, pc, cfg):
        anisotropic = cfg.get("scale_anisotropic", False)
        min_s = cfg.get("min_s", 1.0)
        max_s = cfg.get("max_s", 1.0)
        if anisotropic:
            scale = self.rng.random(pc.shape[1]) * (max_s - min_s) + min_s
        else:
            scale = self.rng.random() * (max_s - min_s) + min_s
        return pc * scale

    def noise(self, pc, cfg):
        noise_std = cfg.get("noise_std", 0.001)
        return pc + (self.rng.standard_normal(pc.shape) *
                     noise_std).astype(np.float32)

    def augment(self, *args, **kwargs):
        raise NotImplementedError(
            "Use SemsegAugmentation or ObjdetAugmentation.")


class SemsegAugmentation(Augmentation):
    """Semantic segmentation augmentations (geometric + chromatic)."""

    _ALL = [
        "recenter", "normalize", "rotate", "scale", "noise", "RandomDropout",
        "RandomHorizontalFlip", "ChromaticAutoContrast",
        "ChromaticTranslation", "ChromaticJitter", "HueSaturationTranslation"
    ]

    def __init__(self, cfg, seed=None):
        super().__init__(cfg, seed=seed)
        for method in (cfg or {}):
            if method not in self._ALL:
                warnings.warn(f"Unknown augmentation method: {method}")

    def RandomDropout(self, pc, feats, labels, cfg):
        ratio = cfg.get("dropout_ratio", 0.2)
        if self.rng.random() < ratio:
            n = len(pc)
            inds = self.rng.choice(n, int(n * (1 - ratio)), replace=False)
            return (pc[inds], feats[inds] if feats is not None else None,
                    labels[inds])
        return pc, feats, labels

    def RandomHorizontalFlip(self, pc, cfg):
        axes = cfg.get("axes", [0, 1])
        if self.rng.random() < 0.95:
            for ax in axes:
                if self.rng.random() < 0.5:
                    pc[:, ax] = np.max(pc[:, ax]) - pc[:, ax]
        return pc

    def ChromaticAutoContrast(self, feats, cfg):
        randomize = cfg.get("randomize_blend_factor", True)
        blend = cfg.get("blend_factor", 0.5)
        if self.rng.random() < 0.2:
            lo = feats[:, :3].min(0, keepdims=True)
            hi = feats[:, :3].max(0, keepdims=True)
            assert hi.max() > 1, \
                "ChromaticAutoContrast expects colors in [0, 255]"
            contrast = (feats[:, :3] - lo) * (255 / (hi - lo))
            blend = self.rng.random() if randomize else blend
            feats[:, :3] = (1 - blend) * feats[:, :3] + blend * contrast
        return feats

    def ChromaticTranslation(self, feats, cfg):
        ratio = cfg.get("trans_range_ratio", 0.1)
        if self.rng.random() < 0.95:
            tr = (self.rng.random((1, 3)) - 0.5) * 255 * 2 * ratio
            feats[:, :3] = np.clip(tr + feats[:, :3], 0, 255)
        return feats

    def ChromaticJitter(self, feats, cfg):
        std = cfg.get("std", 0.01)
        if self.rng.random() < 0.95:
            noise = self.rng.standard_normal((feats.shape[0], 3)) * std * 255
            feats[:, :3] = np.clip(noise + feats[:, :3], 0, 255)
        return feats

    @staticmethod
    def _rgb_to_hsv(rgb):
        """Vectorized colorsys.rgb_to_hsv over [...,3] arrays in [0,255]."""
        rgb = rgb.astype(np.float64)
        hsv = np.zeros_like(rgb)
        hsv[..., 3:] = rgb[..., 3:]
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        maxc = np.max(rgb[..., :3], axis=-1)
        minc = np.min(rgb[..., :3], axis=-1)
        hsv[..., 2] = maxc
        mask = maxc != minc
        span = np.where(mask, maxc - minc, 1.0)
        hsv[..., 1] = np.where(mask, (maxc - minc) / np.where(
            maxc == 0, 1, maxc), 0.0)
        rc = np.where(mask, (maxc - r) / span, 0.0)
        gc = np.where(mask, (maxc - g) / span, 0.0)
        bc = np.where(mask, (maxc - b) / span, 0.0)
        h = np.select([r == maxc, g == maxc], [bc - gc, 2.0 + rc - bc],
                      default=4.0 + gc - rc)
        hsv[..., 0] = (h / 6.0) % 1.0
        return hsv

    @staticmethod
    def _hsv_to_rgb(hsv):
        """Vectorized colorsys.hsv_to_rgb; v in [0,255], h/s in [0,1]."""
        rgb = np.empty_like(hsv)
        rgb[..., 3:] = hsv[..., 3:]
        h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
        i = (h * 6.0).astype(np.uint8)
        f = (h * 6.0) - i
        p = v * (1.0 - s)
        q = v * (1.0 - s * f)
        t = v * (1.0 - s * (1.0 - f))
        i = i % 6
        conds = [s == 0.0, i == 1, i == 2, i == 3, i == 4, i == 5]
        rgb[..., 0] = np.select(conds, [v, q, p, p, t, v], default=v)
        rgb[..., 1] = np.select(conds, [v, v, v, q, p, p], default=t)
        rgb[..., 2] = np.select(conds, [v, p, t, v, v, q], default=p)
        return rgb.astype(np.uint8)

    def HueSaturationTranslation(self, feat, cfg):
        hue_max = cfg.get("hue_max", 0.5)
        sat_max = cfg.get("saturation_max", 0.2)
        hsv = self._rgb_to_hsv(feat[:, :3])
        hue_val = (self.rng.random() - 0.5) * 2 * hue_max
        sat_ratio = 1 + (self.rng.random() - 0.5) * 2 * sat_max
        hsv[..., 0] = np.remainder(hue_val + hsv[..., 0] + 1, 1)
        hsv[..., 1] = np.clip(sat_ratio * hsv[..., 1], 0, 1)
        feat[:, :3] = np.clip(self._hsv_to_rgb(hsv), 0, 255)
        return feat

    def augment(self, point, feat, labels, cfg, seed=None):
        if cfg is None:
            return point, feat, labels
        if seed is not None:
            self.rng = np.random.default_rng(seed)
        if "recenter" in cfg:
            point = self.recenter(point, cfg["recenter"])
        if "normalize" in cfg:
            point, feat = self.normalize(point, feat, cfg["normalize"])
        if "rotate" in cfg:
            point = self.rotate(point, cfg["rotate"])
        if "scale" in cfg:
            point = self.scale(point, cfg["scale"])
        if "noise" in cfg:
            point = self.noise(point, cfg["noise"])
        if "RandomDropout" in cfg:
            point, feat, labels = self.RandomDropout(point, feat, labels,
                                                     cfg["RandomDropout"])
        if "RandomHorizontalFlip" in cfg:
            point = self.RandomHorizontalFlip(point,
                                              cfg["RandomHorizontalFlip"])
        if "ChromaticAutoContrast" in cfg:
            feat = self.ChromaticAutoContrast(feat,
                                              cfg["ChromaticAutoContrast"])
        if "ChromaticTranslation" in cfg:
            feat = self.ChromaticTranslation(feat,
                                             cfg["ChromaticTranslation"])
        if "ChromaticJitter" in cfg:
            feat = self.ChromaticJitter(feat, cfg["ChromaticJitter"])
        if "HueSaturationTranslation" in cfg:
            feat = self.HueSaturationTranslation(
                feat, cfg["HueSaturationTranslation"])
        return point, feat, labels


class ObjdetAugmentation(Augmentation):
    """Object detection augmentations (reference augmentation.py:409-595)."""

    _ALL = [
        "recenter", "normalize", "rotate", "scale", "noise", "PointShuffle",
        "ObjectRangeFilter", "ObjectSample"
    ]

    def __init__(self, cfg, seed=None):
        super().__init__(cfg, seed=seed)
        for method in (cfg or {}):
            if method not in self._ALL:
                warnings.warn(f"Unknown objdet augmentation: {method}")

    def PointShuffle(self, data):
        self.rng.shuffle(data["point"])
        return data

    @staticmethod
    def in_range_bev(box_range, box_xyzwhlr):
        """box center inside the BEV range [x0, y0, x1, y1]."""
        return ((box_xyzwhlr[0] > box_range[0]) &
                (box_xyzwhlr[1] > box_range[1]) &
                (box_xyzwhlr[0] < box_range[2]) &
                (box_xyzwhlr[1] < box_range[3]))

    def ObjectRangeFilter(self, data, pcd_range):
        """Drop gt boxes whose BEV center is outside the point cloud range,
        and limit yaw to [-pi/2, pi/2] (reference :445-474)."""
        pcd_range = np.asarray(pcd_range)
        bev_range = pcd_range[[0, 1, 3, 4]]
        filtered = []
        for box in data["bounding_boxes"]:
            if self.in_range_bev(bev_range, box.to_xyzwhlr()):
                filtered.append(box)
        data["bounding_boxes"] = filtered
        return data

    def ObjectSample(self, data, db_boxes_dict, sample_dict):
        """Paste ground-truth objects from a database into the scene until
        each class reaches its target count; collision-checked in BEV
        (reference :476-544)."""
        from ..utils.operations import (box_collision_test,
                                        remove_points_in_boxes, sample_class)
        rate = 1.0
        points = data["point"]
        bboxes = data["bounding_boxes"]

        gt_labels_3d = [box.label_class for box in bboxes]
        sampled_num_dict = {}
        for class_name in sample_dict.keys():
            max_sample_num = sample_dict[class_name]
            existing = np.sum([n == class_name for n in gt_labels_3d])
            sampled_num = int(max_sample_num - existing)
            sampled_num = np.round(rate * sampled_num).astype(np.int64)
            sampled_num_dict[class_name] = sampled_num

        sampled = []
        for class_name in sampled_num_dict.keys():
            sampled_num = sampled_num_dict[class_name]
            if sampled_num < 0:
                continue
            sampled_cls = sample_class(class_name, sampled_num, bboxes,
                                       db_boxes_dict[class_name],
                                       rng=self.rng)
            sampled += sampled_cls
            bboxes = bboxes + sampled_cls

        if len(sampled) != 0:
            sampled_points = np.concatenate(
                [box.points_inside_box for box in sampled], axis=0)
            points = remove_points_in_boxes(points, sampled)
            points = np.concatenate([sampled_points[:, :4], points], axis=0)
        data["point"] = points
        data["bounding_boxes"] = bboxes
        return data

    @staticmethod
    def load_gt_database(pickle_path, min_points_dict, sample_dict):
        """Load the gt-database pickle written by scripts/collect_bboxes.py,
        filtered by minimum inside-point counts (reference :504-544)."""
        db_boxes = pickle.load(open(pickle_path, "rb"))
        if min_points_dict is not None:
            db_boxes = [
                db_box for db_box in db_boxes
                if db_box.label_class in min_points_dict and
                db_box.points_inside_box.shape[0] >=
                min_points_dict[db_box.label_class]
            ]
        db_boxes_dict = {}
        for key in sample_dict.keys():
            db_boxes_dict[key] = []
        for db_box in db_boxes:
            if db_box.label_class in sample_dict.keys():
                db_boxes_dict[db_box.label_class].append(db_box)
        return db_boxes_dict

    def augment(self, data, attr, seed=None):
        cfg = self.cfg
        if cfg is None:
            return data
        if seed is not None:
            self.rng = np.random.default_rng(seed)
        if "recenter" in cfg:
            data["point"] = self.recenter(data["point"], cfg["recenter"])
        if "normalize" in cfg:
            data["point"], _ = self.normalize(data["point"], None,
                                              cfg["normalize"])
        if "rotate" in cfg:
            data["point"] = self.rotate(data["point"], cfg["rotate"])
        if "scale" in cfg:
            data["point"] = self.scale(data["point"], cfg["scale"])
        if "noise" in cfg:
            data["point"] = self.noise(data["point"], cfg["noise"])
        if "ObjectSample" in cfg:
            if not hasattr(self, "db_boxes_dict"):
                o = cfg["ObjectSample"]
                self.db_boxes_dict = self.load_gt_database(
                    o["pickle_path"], o.get("min_points_dict"),
                    o["sample_dict"])
            data = self.ObjectSample(data, self.db_boxes_dict,
                                     cfg["ObjectSample"]["sample_dict"])
        if cfg.get("ObjectRangeFilter", False):
            data = self.ObjectRangeFilter(
                data, cfg["ObjectRangeFilter"]["point_cloud_range"])
        if cfg.get("PointShuffle", False):
            data = self.PointShuffle(data)
        return data
