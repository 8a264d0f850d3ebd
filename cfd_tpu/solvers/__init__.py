from . import energy, ns, poisson

__all__ = ["energy", "ns", "poisson"]
