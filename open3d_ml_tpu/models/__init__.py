"""Model zoo: semantic segmentation + 3D object detection networks."""

from .base_model import BaseModel
from .base_model_objdet import ObjdetBaseModel
from .kpconv import KPFCNN
from .point_pillars import PointPillars
from .point_rcnn import PointRCNN
from .compiled_model import CompiledModel
from .pointnet2 import Pointnet2MSG
from .point_transformer import PointTransformer
from .pvcnn import PVCNN
from .randlanet import RandLANet
from .sparseconvunet import SparseConvUnet

__all__ = [
    "CompiledModel",
    "BaseModel", "KPFCNN", "ObjdetBaseModel", "PointPillars", "PointRCNN",
    "Pointnet2MSG", "PointTransformer", "PVCNN", "RandLANet",
    "SparseConvUnet"
]
