from .semseg_metric import SemSegMetric

__all__ = ["SemSegMetric"]
