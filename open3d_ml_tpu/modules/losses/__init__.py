from .cross_entropy import CrossEntropyLoss
from .focal_loss import FocalLoss
from .semseg_loss import SemSegLoss, filter_valid_label
from .smooth_l1 import SmoothL1Loss

__all__ = [
    "CrossEntropyLoss", "FocalLoss", "SemSegLoss", "filter_valid_label",
    "SmoothL1Loss"
]
