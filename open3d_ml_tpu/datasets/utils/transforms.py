"""Transform helpers shared by model data pipelines.

Rebuild of /root/reference/ml3d/datasets/utils/transforms.py: normalization
and KD-tree patch cropping used by several models' transforms.
"""

import numpy as np


def trans_normalize(pc, feat, t_normalize):
    """Normalize points/features per the model's t_normalize config
    (reference transforms.py:8-40)."""
    if not t_normalize or t_normalize.get("method") is None:
        return pc, feat
    method = t_normalize.get("method")
    if method == "linear":
        if t_normalize.get("normalize_points", False):
            pc -= pc.mean(0)
            pc /= (pc.max(0) - pc.min(0)).max()
        if feat is not None:
            bias = t_normalize.get("feat_bias", 0)
            scale = t_normalize.get("feat_scale", 1)
            feat -= bias
            feat /= scale
    elif method == "coords_only":
        pc -= pc.mean(0)
        pc /= (pc.max(0) - pc.min(0)).max()
        feat = None
    return pc, feat


def trans_augment(points, t_augment, rng=None):
    """Rotation/scale augmentation (reference transforms.py:43-100)."""
    if not t_augment or not t_augment.get("turn_on", False):
        return points
    from ..augment import Augmentation
    aug = Augmentation({}, seed=rng)
    cfg_rotate = {"method": t_augment.get("rotation_method", "vertical")}
    points = aug.recenter(points.copy(), {"dim": [0, 1, 2]})
    points = aug.rotate(points, cfg_rotate)
    points = aug.scale(points, {
        "min_s": t_augment.get("min_s", 1.0),
        "max_s": t_augment.get("max_s", 1.0),
        "scale_anisotropic": t_augment.get("scale_anisotropic", False),
    })
    if t_augment.get("noise_level"):
        points = aug.noise(points, {"noise_std": t_augment["noise_level"]})
    return points


def trans_crop_pc(points, feat, labels, search_tree, pick_idx, num_points):
    """Crop a num_points patch around the pick_idx point using the KD-tree
    (reference transforms.py:103-126)."""
    center_point = points[pick_idx, :].reshape(1, -1)
    if points.shape[0] < num_points:
        select_idx = np.arange(points.shape[0])
        diff = num_points - points.shape[0]
        select_idx = np.concatenate(
            [select_idx,
             np.random.choice(points.shape[0], diff)])
    else:
        select_idx = np.asarray(
            search_tree.query(center_point, k=num_points)[1][0])
    rng = np.random.default_rng()
    rng.shuffle(select_idx)
    select_points = points[select_idx]
    select_feat = feat[select_idx] if feat is not None else None
    select_labels = labels[select_idx]
    return select_points, select_feat, select_labels, select_idx
