"""Abstract dataset + split classes.

Rebuild of /root/reference/ml3d/datasets/base_dataset.py:12-148. A dataset
yields numpy dicts {'point', 'feat', 'label', ...} per cloud; a split wires a
sampler (test -> SemSegSpatiallyRegularSampler, else config or random).
"""

import logging
from abc import ABC, abstractmethod

import numpy as np

from ..utils import Config, get_module

log = logging.getLogger(__name__)


class BaseDataset(ABC):
    """Base class for all datasets; subclasses implement file discovery,
    parsing and label handling. Config kwargs are stored as self.cfg."""

    def __init__(self, **kwargs):
        if kwargs.get("dataset_path") is None:
            raise KeyError("Provide dataset_path to initialize the dataset")
        if kwargs.get("name") is None:
            raise KeyError("Provide dataset name to initialize it")
        self.cfg = Config(kwargs)
        self.name = self.cfg.name
        self.rng = np.random.default_rng(kwargs.get("seed", None))

    @staticmethod
    @abstractmethod
    def get_label_to_names():
        """dict: label id -> human-readable name."""

    @abstractmethod
    def get_split(self, split):
        """Return a BaseDatasetSplit for 'training'|'validation'|'test'|'all'."""

    @abstractmethod
    def is_tested(self, attr):
        """True if a test result is already stored for this attr."""

    @abstractmethod
    def save_test_result(self, results, attr):
        """Persist model output for the datum with the given attr."""


class BaseDatasetSplit(ABC):
    """Access to one split of a dataset; owns the split's sampler."""

    def __init__(self, dataset, split="training"):
        self.cfg = dataset.cfg
        self.path_list = dataset.get_split_list(split)
        self.split = split
        self.dataset = dataset

        if split in ["test"]:
            sampler_cls = get_module("sampler",
                                     "SemSegSpatiallyRegularSampler")
        else:
            sampler_cfg = self.cfg.get("sampler",
                                       {"name": "SemSegRandomSampler"})
            sampler_cls = get_module("sampler", sampler_cfg["name"])
        self.sampler = sampler_cls(self)

    @abstractmethod
    def __len__(self):
        return 0

    @abstractmethod
    def get_data(self, idx):
        return {}

    @abstractmethod
    def get_attr(self, idx):
        return {}
