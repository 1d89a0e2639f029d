"""Dataset readers, samplers, augmentations and data utilities."""

from . import augment, samplers, utils
from .base_dataset import BaseDataset, BaseDatasetSplit
from .customdataset import Custom3D
from .inference_dummy import InferenceDummySplit
from .kitti import KITTI
from .semantickitti import SemanticKITTI

__all__ = [
    "augment", "samplers", "utils", "BaseDataset", "BaseDatasetSplit",
    "Custom3D", "InferenceDummySplit", "KITTI", "SemanticKITTI",
]
