"""Task pipelines: model-agnostic train/eval/test loops."""

from .base_pipeline import BasePipeline
from .object_detection import ObjectDetection
from .semantic_segmentation import SemanticSegmentation

__all__ = ["BasePipeline", "ObjectDetection", "SemanticSegmentation"]
