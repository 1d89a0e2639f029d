"""Base contract for 3D object detection models.

Rebuild of /root/reference/ml3d/torch/models/base_model_objdet.py:11-94 in
the same host/device split as BaseModel: preprocess/transform on the host
(emitting fixed-shape padded arrays), the network as a flax module applied
inside jitted steps, loss as a pure function of (net outputs, batch).
"""

from abc import abstractmethod

from .base_model import BaseModel


class ObjdetBaseModel(BaseModel):

    @abstractmethod
    def get_loss(self, results, inputs):
        """Compute the loss dict from network outputs + padded batch."""

    @abstractmethod
    def inference_end(self, results, inputs):
        """Convert network outputs to lists of BEVBox3D per sample."""
