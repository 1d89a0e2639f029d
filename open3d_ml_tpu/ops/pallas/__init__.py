"""Pallas TPU kernels for the hot ops."""

from .knn import knn_pallas

__all__ = ["knn_pallas"]
