from .boundingbox import BoundingBox3D

__all__ = ["BoundingBox3D"]
