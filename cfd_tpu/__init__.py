"""cfd_tpu — a TPU-native incompressible Navier-Stokes framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the shaia/CFD
C library (2D/3D incompressible NS on structured grids, four time
integrators, a pressure-Poisson solver suite, a rich boundary-condition
subsystem, energy equation with Boussinesq buoyancy, VTK/CSV output, and a
versioned CRC-protected checkpoint format) — built for jit/scan/sharding
rather than translated from the C backend matrix.
"""

from . import config
from .config import default_dtype, set_default_dtype
from .core import FlowField, Grid, CFDError, Status
from .core.runtime import finalize, init, is_initialized

__version__ = "0.7.0"


def __getattr__(name):
    # Lazy submodule access so `import cfd_tpu` stays light.
    if name in ("api", "boundary", "io", "ops", "parallel", "solvers"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'cfd_tpu' has no attribute {name!r}")


__all__ = ["config", "default_dtype", "set_default_dtype",
           "FlowField", "Grid", "CFDError", "Status", "__version__",
           "api", "boundary", "io", "ops", "parallel", "solvers"]
