from . import profiling
from .profiling import StepTimer, synchronized_time, trace

__all__ = ["profiling", "StepTimer", "synchronized_time", "trace"]
