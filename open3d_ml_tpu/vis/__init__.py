from .boundingbox import BoundingBox3D
from .colormap import Colormap
from .labellut import LabelLUT
from .visualizer import DataModel, DatasetModel, Model, Visualizer

__all__ = [
    "BoundingBox3D", "Colormap", "LabelLUT", "DataModel", "DatasetModel",
    "Model", "Visualizer"
]
