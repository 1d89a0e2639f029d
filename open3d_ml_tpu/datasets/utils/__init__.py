from .bev_box import BEVBox3D
from .dataprocessing import DataProcessing
from . import operations

__all__ = ["BEVBox3D", "DataProcessing", "operations"]
