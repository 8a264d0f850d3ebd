from .field import FlowField
from .grid import Grid
from .status import CFDError, Status
from . import derived, features, filesystem, logging, status

__all__ = ["FlowField", "Grid", "CFDError", "Status", "derived", "features",
           "filesystem", "logging", "status"]
