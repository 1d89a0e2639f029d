"""Evaluation metrics (host-side)."""

from ..ops.iou import iou_3d, iou_bev
from .mAP import mAP, precision_3d

__all__ = ["iou_3d", "iou_bev", "mAP", "precision_3d"]
