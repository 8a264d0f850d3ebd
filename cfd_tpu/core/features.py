"""Platform / backend detection.

The reference detects CPU SIMD capabilities at runtime (`cpu_features.h:47-75`)
and exposes a backend-availability API (`navier_stokes_solver.h:357-367`).  In
the TPU-native build the scalar/AVX2/NEON/OMP/CUDA matrix collapses into one
XLA path; "backend availability" becomes a question about which JAX platforms
are visible.  The reference backend names are kept so user code and tests
written against the C API's semantics keep working:

* SCALAR — always available (jax on any platform).
* SIMD   — always available (XLA vectorizes everything).
* OMP    — always available (XLA multithreads on CPU / parallelizes on device).
* CUDA   — mapped to "an accelerator platform is present" (TPU or GPU).
"""

from __future__ import annotations

import enum
import functools

import jax


class Backend(enum.IntEnum):
    """Mirrors ns_solver_backend_t (`navier_stokes_solver.h:172-177`)."""

    SCALAR = 0
    SIMD = 1
    OMP = 2
    CUDA = 3  # interpreted as "accelerator" (TPU/GPU)


_BACKEND_NAMES = {
    Backend.SCALAR: "Scalar",
    Backend.SIMD: "SIMD",
    Backend.OMP: "OpenMP",
    Backend.CUDA: "Accelerator",
}


@functools.lru_cache(maxsize=None)
def accelerator_available() -> bool:
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


def backend_is_available(backend: Backend) -> bool:
    """`cfd_backend_is_available` equivalent."""
    backend = Backend(backend)
    if backend in (Backend.SCALAR, Backend.SIMD, Backend.OMP):
        return True
    if backend == Backend.CUDA:
        return accelerator_available()
    return False


def backend_get_name(backend: Backend) -> str:
    try:
        return _BACKEND_NAMES[Backend(backend)]
    except (ValueError, KeyError):
        return "Unknown"


def default_platform() -> str:
    return jax.default_backend()
