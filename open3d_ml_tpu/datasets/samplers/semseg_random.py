"""Random cloud + KDTree-patch point sampler for semantic segmentation.

Rebuild of /root/reference/ml3d/datasets/samplers/semseg_random.py:7-58:
cloud order is a fresh permutation per epoch; the point sampler picks a random
center and takes its num_points nearest neighbors (whole cloud, padded by
random duplication, when the cloud is smaller), then shuffles — the shuffle is
what lets downstream models treat pc[:n//r] as a random subsample.
"""

import numpy as np

from ...utils import SAMPLER


class SemSegRandomSampler:

    def __init__(self, dataset):
        self.dataset = dataset
        self.length = len(dataset)
        self.split = dataset.split
        self.rng = np.random.default_rng()

    def __len__(self):
        return self.length

    def initialize_with_dataloader(self, dataloader):
        self.length = len(dataloader)

    def get_cloud_sampler(self):

        def gen():
            for i in self.rng.permutation(self.length):
                yield int(i)

        return gen()

    @staticmethod
    def get_point_sampler():

        def _random_centered_gen(**kwargs):
            pc = kwargs.get("pc")
            num_points = kwargs.get("num_points")
            search_tree = kwargs.get("search_tree")
            rng = kwargs.get("rng") or np.random.default_rng()
            if pc is None or num_points is None or search_tree is None:
                raise KeyError("Provide pc, num_points and search_tree to "
                               "the SemSegRandomSampler point sampler")
            center_idx = rng.choice(len(pc), 1)
            center_point = pc[center_idx, :].reshape(1, -1)
            if pc.shape[0] < num_points:
                diff = num_points - pc.shape[0]
                idxs = np.concatenate(
                    [np.arange(pc.shape[0]),
                     rng.choice(pc.shape[0], diff)])
            else:
                idxs = np.asarray(
                    search_tree.query(center_point, k=num_points)[1][0])
            rng.shuffle(idxs)
            return pc[idxs], idxs, center_point

        return _random_centered_gen


SAMPLER._register_module(SemSegRandomSampler)
