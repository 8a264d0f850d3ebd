"""BC error-handler and backend-selection compatibility API.

Mirrors the reference's pluggable BC error handler
(`boundary_conditions.h:371-416`) and global backend selectors
(`boundary_conditions.h:418-454`, `poisson_solver.h:345-375`).  In the
TPU-native build there is one XLA backend, so the selectors validate and
record the choice (AUTO/SCALAR/OMP/SIMD always succeed; CUDA-class requests
succeed when an accelerator is present) without changing code paths — they
exist so code written against the C API keeps working and can introspect
what it selected.
"""

from __future__ import annotations

import enum
from typing import Callable, Optional

from ..core.features import accelerator_available
from ..core.logging import error as log_error


class BCErrorCode(enum.IntEnum):
    """Mirrors bc_error_code_t (`boundary_conditions.h:371-376`)."""

    NONE = 0
    NO_SIMD_BACKEND = 1
    INTERNAL = 2
    INVALID = 3


class BCBackend(enum.IntEnum):
    """Mirrors bc_backend_t (`boundary_conditions.h:36-42`)."""

    AUTO = 0
    SCALAR = 1
    OMP = 2
    SIMD = 3
    CUDA = 4


_handler: Optional[Callable] = None
_handler_user_data = None
_backend = BCBackend.AUTO


def set_error_handler(handler: Optional[Callable], user_data=None) -> None:
    """bc_set_error_handler: handler(code, function, message, user_data);
    None restores the default (log to the error stream)."""
    global _handler, _handler_user_data
    _handler = handler
    _handler_user_data = user_data


def get_error_handler() -> Optional[Callable]:
    return _handler


def report_error(code: BCErrorCode, function: str, message: str) -> None:
    """Dispatch an internal BC error through the registered handler."""
    if _handler is not None:
        _handler(BCErrorCode(code), function, message, _handler_user_data)
    else:
        log_error("boundary", "%s: %s", function, message)


def backend_available(backend: BCBackend) -> bool:
    backend = BCBackend(backend)
    if backend == BCBackend.CUDA:
        return accelerator_available()
    return True


def set_backend(backend: BCBackend) -> bool:
    """bc_set_backend: record the selection; False when unavailable."""
    global _backend
    backend = BCBackend(backend)
    if not backend_available(backend):
        return False
    _backend = backend
    return True


def get_backend() -> BCBackend:
    return _backend


def get_backend_name() -> str:
    names = {BCBackend.AUTO: "auto", BCBackend.SCALAR: "scalar",
             BCBackend.OMP: "omp", BCBackend.SIMD: "simd (xla)",
             BCBackend.CUDA: "cuda (accelerator)"}
    return names[_backend]
