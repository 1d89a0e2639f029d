from .batch_loader import BatchLoader
from .batcher import ConcatBatcher, DefaultBatcher
from .dataloader import PointCloudDataloader

# reference-API alias
TorchDataloader = PointCloudDataloader

__all__ = [
    "BatchLoader", "ConcatBatcher", "DefaultBatcher",
    "PointCloudDataloader", "TorchDataloader"
]
