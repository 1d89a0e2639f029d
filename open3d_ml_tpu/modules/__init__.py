from . import losses, metrics, optimizers, schedulers

__all__ = ["losses", "metrics", "optimizers", "schedulers"]
