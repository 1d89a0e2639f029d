from . import operations, transforms
from .bev_box import BEVBox3D
from .dataprocessing import DataProcessing
from .transforms import trans_augment, trans_crop_pc, trans_normalize

__all__ = [
    "BEVBox3D", "DataProcessing", "operations", "transforms",
    "trans_augment", "trans_crop_pc", "trans_normalize"
]
