from . import losses, metrics, schedulers

__all__ = ["losses", "metrics", "schedulers"]
