from .dataprocessing import DataProcessing

__all__ = ["DataProcessing"]
