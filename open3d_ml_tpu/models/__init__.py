"""Model zoo: semantic segmentation + 3D object detection networks."""

from .base_model import BaseModel
from .randlanet import RandLANet

__all__ = ["BaseModel", "RandLANet"]
