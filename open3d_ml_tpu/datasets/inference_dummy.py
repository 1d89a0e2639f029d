"""Single-datum pseudo split used by run_inference.

Rebuild of /root/reference/ml3d/datasets/inference_dummy.py:9-31: wraps one
in-memory data dict as a split so the normal dataloader machinery applies.
"""

import logging

from ..utils import DATASET
from .base_dataset import BaseDatasetSplit

log = logging.getLogger(__name__)


class InferenceDummySplit(BaseDatasetSplit):

    def __init__(self, inference_data):
        self.split = "test"
        self.inference_data = inference_data
        self.cfg = {"cache_dir": "./logs/cache"}
        sampler_cls = None
        from ..utils import get_module
        sampler_cls = get_module("sampler", "SemSegSpatiallyRegularSampler")
        self.sampler = sampler_cls(self)

    def __len__(self):
        return 1

    def get_data(self, idx):
        return self.inference_data

    def get_attr(self, idx):
        return {"idx": 0, "name": "inference", "path": "",
                "split": "test"}
