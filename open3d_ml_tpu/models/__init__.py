"""Model zoo: semantic segmentation + 3D object detection networks."""

from .base_model import BaseModel
from .base_model_objdet import ObjdetBaseModel
from .point_pillars import PointPillars
from .randlanet import RandLANet

__all__ = ["BaseModel", "ObjdetBaseModel", "PointPillars", "RandLANet"]
