"""Host-side grid subsampling (preprocess-time, cacheable).

Replacement for the reference's external C++ `open3d.ml.contrib.subsample` /
`subsample_batch` (/root/reference/ml3d/datasets/utils/dataprocessing.py:6,
ml3d/torch/models/kpconv.py:11): points falling in the same voxel of edge
``grid_size`` are reduced to their barycenter; features are averaged; labels
take a majority vote. Runs once per cloud at preprocess time and is cached on
disk, so a numpy sort-reduce is the right tool; a C++ ctypes fast path is used
when the native library is built (open3d_ml_tpu/native).
"""

import numpy as np


def grid_subsampling(points, features=None, labels=None, grid_size=0.1,
                     verbose=0):
    """Barycenter grid subsampling.

    Args:
        points: [N, 3] float32.
        features: optional [N, D].
        labels: optional [N] int.
        grid_size: voxel edge length.

    Returns (like the reference DataProcessing.grid_subsampling,
    dataprocessing.py:13-49): sub_points, [sub_features,] [sub_labels]
    depending on which optional inputs were given.
    """
    points = np.asarray(points, np.float32)
    coords = np.floor((points - points.min(axis=0)) / grid_size)
    coords = coords.astype(np.int64)
    dims = coords.max(axis=0) + 1
    key = (coords[:, 2] * dims[1] + coords[:, 1]) * dims[0] + coords[:, 0]

    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    nv = uniq.shape[0]
    denom = counts[:, None].astype(np.float32)

    sub_points = np.zeros((nv, 3), np.float64)
    np.add.at(sub_points, inv, points.astype(np.float64))
    sub_points = (sub_points / denom).astype(np.float32)

    out = [sub_points]
    if features is not None:
        features = np.asarray(features)
        sub_feat = np.zeros((nv, features.shape[1]), np.float64)
        np.add.at(sub_feat, inv, features.astype(np.float64))
        out.append((sub_feat / denom).astype(np.float32))
    if labels is not None:
        labels = np.asarray(labels).reshape(-1).astype(np.int64)
        # Majority vote per voxel: count (voxel, label) pairs.
        nl = int(labels.max()) + 1 if labels.size else 1
        pair = inv.astype(np.int64) * nl + labels
        pair_uniq, pair_counts = np.unique(pair, return_counts=True)
        vox = pair_uniq // nl
        lab = pair_uniq % nl
        # Sort by (voxel, count) so the last entry per voxel is the argmax;
        # ties resolve to the larger label id (deterministic).
        order = np.lexsort((lab, pair_counts, vox))
        vox_o, lab_o = vox[order], lab[order]
        last = np.concatenate([vox_o[1:] != vox_o[:-1], [True]])
        sub_labels = np.zeros((nv,), np.int32)
        sub_labels[vox_o[last]] = lab_o[last].astype(np.int32)
        out.append(sub_labels)
    if len(out) == 1:
        return out[0]
    return tuple(out)


def grid_subsampling_batch(points, row_splits, features=None, labels=None,
                           grid_size=0.1):
    """Per-cloud grid subsampling over a ragged batch (host-side).

    Equivalent of the reference `subsample_batch`
    (ml3d/torch/models/kpconv.py:2037-2166) without the random rotation
    augmentation (applied by callers when needed).
    Returns (sub_points, sub_row_splits, [sub_features], [sub_labels]).
    """
    outs, feat_outs, lab_outs = [], [], []
    splits = [0]
    for i in range(len(row_splits) - 1):
        s, e = int(row_splits[i]), int(row_splits[i + 1])
        f = features[s:e] if features is not None else None
        l = labels[s:e] if labels is not None else None
        res = grid_subsampling(points[s:e], features=f, labels=l,
                               grid_size=grid_size)
        if not isinstance(res, tuple):
            res = (res,)
        outs.append(res[0])
        j = 1
        if features is not None:
            feat_outs.append(res[j])
            j += 1
        if labels is not None:
            lab_outs.append(res[j])
        splits.append(splits[-1] + res[0].shape[0])
    ret = [np.concatenate(outs, axis=0), np.asarray(splits, np.int64)]
    if features is not None:
        ret.append(np.concatenate(feat_outs, axis=0))
    if labels is not None:
        ret.append(np.concatenate(lab_outs, axis=0))
    return tuple(ret)
