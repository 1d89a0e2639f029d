"""Host-side data processing helpers.

Rebuild of /root/reference/ml3d/datasets/utils/dataprocessing.py:13-244 with
the external deps swapped for local equivalents: grid subsampling is the numpy
sort-reduce in ops.subsample (replacing open3d.ml.contrib.subsample) and KNN
uses scipy's cKDTree (replacing open3d.core.nns).
"""

import numpy as np
from scipy.spatial import cKDTree

from ...ops.subsample import grid_subsampling as _grid_subsampling


class DataProcessing:

    @staticmethod
    def grid_subsampling(points,
                         features=None,
                         labels=None,
                         grid_size=0.1,
                         verbose=0):
        """Barycenter grid subsampling (CPU, preprocess-time).

        Returns sub_points, or (sub_points, sub_features), or
        (sub_points, sub_labels), or (sub_points, sub_features, sub_labels)
        depending on the optional inputs — matching the reference contract.
        """
        return _grid_subsampling(points,
                                 features=features,
                                 labels=labels,
                                 grid_size=grid_size)

    @staticmethod
    def knn_search(support_pts, query_pts, k):
        """Exact KNN on host: returns [N2, k] int32 neighbor indices.

        Uses the native C++ KD-tree (open3d_ml_tpu/native) when built,
        scipy otherwise. If fewer than k support points exist, indices wrap
        by repetition.
        """
        support = np.asarray(support_pts, np.float32)
        query = np.asarray(query_pts, np.float32)
        n = support.shape[0]
        kk = min(k, n)
        from ...native import NativeKDTree, native_available
        if native_available() and n > 64:
            _, idx = NativeKDTree(support).query(query, k=kk)
        else:
            tree = cKDTree(support)
            _, idx = tree.query(query, k=kk)
        idx = idx.reshape(query.shape[0], kk)
        if kk < k:
            reps = int(np.ceil(k / kk))
            idx = np.tile(idx, (1, reps))[:, :k]
        return idx.astype(np.int32)

    @staticmethod
    def load_pc_kitti(pc_path):
        scan = np.fromfile(pc_path, dtype=np.float32)
        return scan.reshape((-1, 4))

    @staticmethod
    def load_label_kitti(label_path, remap_lut):
        label = np.fromfile(label_path, dtype=np.uint32).reshape(-1)
        sem_label = label & 0xFFFF
        return remap_lut[sem_label].astype(np.int32)

    @staticmethod
    def load_pc_semantic3d(filename):
        return np.loadtxt(filename, dtype=np.float32)

    @staticmethod
    def load_label_semantic3d(filename):
        return np.loadtxt(filename, dtype=np.int32).reshape(-1)

    @staticmethod
    def data_aug(xyz, color, labels, idx, num_out):
        """Pad a cropped patch to num_out points by re-sampling its own
        rows (reference dataprocessing.py:106-117): duplicates are drawn
        from the existing indices so feature statistics are preserved."""
        num_in = len(xyz)
        sel = np.concatenate([
            np.arange(num_in),
            np.random.choice(num_in, num_out - num_in)
        ])
        return xyz[sel], color[sel], idx[sel], labels[sel]

    @staticmethod
    def shuffle_idx(x, rng=None):
        rng = rng or np.random.default_rng()
        idx = rng.permutation(len(x))
        return x[idx]

    @staticmethod
    def shuffle_list(data_list, rng=None):
        rng = rng or np.random.default_rng()
        idx = rng.permutation(np.shape(data_list)[0])
        return np.asarray(data_list)[idx]

    @staticmethod
    def IoU_from_confusions(confusions):
        """Per-class IoU from (stacked) confusion matrices [..., C, C].

        Zero-denominator classes fall back to the mean IoU of the valid
        classes (reference semantics, dataprocessing.py:132-159).
        """
        confusions = np.asarray(confusions)
        tp = np.diagonal(confusions, axis1=-2, axis2=-1)
        fn = np.sum(confusions, axis=-1) - tp
        fp = np.sum(confusions, axis=-2) - tp
        denom = tp + fp + fn + 1e-6
        iou = tp / denom
        mask = denom < 1e-3
        counts = np.sum(1 - mask, axis=-1, keepdims=True)
        mean_iou = np.sum(iou, axis=-1, keepdims=True) / (counts + 1e-6)
        return np.where(mask, mean_iou, iou)

    @staticmethod
    def Acc_from_confusions(confusions):
        return confusions.diagonal() / confusions.sum(axis=0)

    @staticmethod
    def get_class_weights(num_per_class):
        """Inverse-frequency class weights: 1 / (freq + 0.02)."""
        num_per_class = np.array(num_per_class, dtype=np.float32)
        weight = num_per_class / float(np.sum(num_per_class))
        return 1.0 / (weight + 0.02)

    @staticmethod
    def invT(T):
        """Invert a [4,4] row-vector-convention rigid/affine transform."""
        R = T[:3, :3]
        t = T[3:, :3]
        Rinv = np.linalg.inv(R)
        tinv = t @ -Rinv
        M = np.concatenate([Rinv, tinv], axis=0)
        return np.concatenate([M, [[0], [0], [0], [1]]], axis=1)

    @staticmethod
    def world2cam(points, world_cam):
        """Lidar/world -> camera coords; row-vector convention [N,4]@[4,4]."""
        pts = np.hstack(
            (points[:, :3], np.ones((points.shape[0], 1), np.float32)))
        return (pts @ world_cam)[..., :3]

    @staticmethod
    def cam2img(points, cam_img):
        """Camera -> image plane. Returns ([N,2] pixels, [N] rect depth)."""
        pts = np.hstack(
            (points[:, :3], np.ones((points.shape[0], 1), np.float32)))
        proj = pts @ cam_img
        pts_img = proj[:, :2] / proj[:, 3:4]
        depth = proj[:, 2] - cam_img[3, 2]
        return pts_img, depth

    @staticmethod
    def cam2world(points, world_cam):
        cam_world = DataProcessing.invT(world_cam)
        pts = np.hstack(
            (points[:, :3], np.ones((points.shape[0], 1), np.float32)))
        return (pts @ cam_world)[..., :3]

    @staticmethod
    def remove_outside_points(points, world_cam, cam_img, image_shape):
        """Keep only points projecting inside the image with depth >= 0."""
        pts_cam = DataProcessing.world2cam(points[:, :3], world_cam)
        pts_img, depth = DataProcessing.cam2img(pts_cam, cam_img)
        ok_x = (pts_img[:, 0] >= 0) & (pts_img[:, 0] < image_shape[1])
        ok_y = (pts_img[:, 1] >= 0) & (pts_img[:, 1] < image_shape[0])
        return points[ok_x & ok_y & (depth >= 0)]
