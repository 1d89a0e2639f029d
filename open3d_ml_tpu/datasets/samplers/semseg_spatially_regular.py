"""Spatially-regular patch sampler driven by per-point possibility maps.

Rebuild of /root/reference/ml3d/datasets/samplers/
semseg_spatially_regular.py:7-111 — the reference's mechanism for covering
multi-million-point clouds with fixed-size patches: every point carries a
"possibility" score; patches are centered on the least-covered point; visited
points gain coverage credit (1 - d^2/max d^2)^2; a cloud is done when its min
possibility exceeds 0.5.
"""

import numpy as np

from ...utils import SAMPLER


class SemSegSpatiallyRegularSampler:

    def __init__(self, dataset):
        self.dataset = dataset
        self.length = len(dataset)
        self.split = dataset.split
        self.rng = np.random.default_rng()
        self.cloud_id = 0

    def __len__(self):
        return self.length

    def initialize_with_dataloader(self, dataloader):
        self.possibilities = []
        self.min_possibilities = []
        self.length = len(dataloader)
        dataset = self.dataset
        for index in range(len(dataset)):
            attr = dataset.get_attr(index)
            if getattr(dataloader, "cache_convert", None):
                data = dataloader.cache_convert(attr["name"])
            elif getattr(dataloader, "preprocess", None):
                data = dataloader.preprocess(dataset.get_data(index), attr)
            else:
                data = dataset.get_data(index)
            n = data["point"].shape[0]
            self.possibilities.append(self.rng.random(n) * 1e-3)
            self.min_possibilities.append(
                float(np.min(self.possibilities[-1])))

    def get_cloud_sampler(self):

        def gen_train():
            for _ in range(self.length):
                self.cloud_id = int(np.argmin(self.min_possibilities))
                yield self.cloud_id

        def gen_test():
            curr = 0
            while curr < self.length:
                if self.min_possibilities[curr] > 0.5:
                    curr += 1
                    continue
                self.cloud_id = curr
                yield self.cloud_id

        if self.split in ["train", "training", "valid", "validation"]:
            return gen_train()
        return gen_test()

    def get_point_sampler(self):

        def _sampler(patchwise=True, **kwargs):
            if not patchwise:
                self.possibilities[self.cloud_id][:] = 1.0
                self.min_possibilities[self.cloud_id] = 1.0
                return None
            pc = kwargs.get("pc")
            num_points = kwargs.get("num_points")
            radius = kwargs.get("radius")
            search_tree = kwargs.get("search_tree")
            rng = kwargs.get("rng") or self.rng
            if pc is None or (search_tree is None and radius is None):
                raise KeyError("Provide pc and (search_tree or radius) to "
                               "the spatially-regular point sampler")

            cid = self.cloud_id
            n = 0
            while n < 2:
                center_id = int(np.argmin(self.possibilities[cid]))
                center_point = pc[center_id, :].reshape(1, -1)
                if radius is not None:
                    # KPConv-style in_radius ball patch; support both tree
                    # APIs (scipy cKDTree from model.preprocess, sklearn
                    # KDTree from user code)
                    if hasattr(search_tree, "query_radius"):  # sklearn
                        idxs = search_tree.query_radius(center_point,
                                                        r=radius)[0]
                    else:  # scipy cKDTree
                        idxs = np.asarray(search_tree.query_ball_point(
                            center_point[0], r=radius), dtype=np.int64)
                elif num_points is not None:
                    if pc.shape[0] < num_points:
                        diff = num_points - pc.shape[0]
                        idxs = np.concatenate([
                            np.arange(pc.shape[0]),
                            rng.choice(pc.shape[0], diff)
                        ])
                    else:
                        idxs = np.asarray(
                            search_tree.query(center_point,
                                              k=num_points)[1][0])
                n = len(idxs)
                if n < 2:
                    self.possibilities[cid][center_id] += 0.001

            idxs = np.asarray(idxs)
            rng.shuffle(idxs)
            patch = pc[idxs]
            dists = np.sum(np.square(
                (patch - center_point).astype(np.float32)),
                           axis=1)
            delta = np.square(1 - dists / np.max(dists))
            self.possibilities[cid][idxs] += delta
            self.min_possibilities[cid] = float(
                np.min(self.possibilities[cid]))
            return patch, idxs, center_point

        return _sampler


SAMPLER._register_module(SemSegSpatiallyRegularSampler)
