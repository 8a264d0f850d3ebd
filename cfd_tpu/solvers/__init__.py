from . import poisson

__all__ = ["poisson"]
