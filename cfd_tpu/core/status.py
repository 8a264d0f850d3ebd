"""Status codes, error state, and exceptions.

TPU-native re-design of the reference's status subsystem
(`lib/include/cfd/core/cfd_status.h:13-43`, `lib/src/core/logging.c:13-19`):

* the C enum becomes :class:`Status` (same numeric values so checkpoint files
  and logs are interoperable);
* the thread-local "last error" C API becomes a thread-local error record with
  the same get/set/clear surface;
* host-level failures additionally raise :class:`CFDError` when the caller
  asks for exception semantics.

On-device divergence (NaN/Inf detected inside a jitted step) cannot raise —
solvers carry a status code through ``lax.scan`` / ``lax.while_loop`` and the
host converts it to a :class:`Status` after the step returns.
"""

from __future__ import annotations

import enum
import threading


class Status(enum.IntEnum):
    """Mirrors cfd_status_t (`cfd_status.h:13-25`)."""

    SUCCESS = 0
    ERROR = -1
    ERROR_NOMEM = -2
    ERROR_INVALID = -3
    ERROR_IO = -4
    ERROR_UNSUPPORTED = -5
    ERROR_DIVERGED = -6
    ERROR_MAX_ITER = -7
    ERROR_LIMIT_EXCEEDED = -8
    ERROR_NOT_FOUND = -9


_STATUS_STRINGS = {
    Status.SUCCESS: "Success",
    Status.ERROR: "Generic error",
    Status.ERROR_NOMEM: "Out of memory",
    Status.ERROR_INVALID: "Invalid argument",
    Status.ERROR_IO: "I/O error",
    Status.ERROR_UNSUPPORTED: "Operation not supported",
    Status.ERROR_DIVERGED: "Solver diverged",
    Status.ERROR_MAX_ITER: "Maximum iterations reached",
    Status.ERROR_LIMIT_EXCEEDED: "Resource limit exceeded",
    Status.ERROR_NOT_FOUND: "Resource not found",
}


class CFDError(Exception):
    """Host-level exception carrying a :class:`Status` code."""

    def __init__(self, status: Status, message: str = ""):
        self.status = Status(status)
        super().__init__(message or get_error_string(status))


# Thread-local last-error record (mirrors the reference's TLS error state).
_tls = threading.local()


def set_error(status: Status, message: str) -> None:
    _tls.status = Status(status)
    _tls.message = message


def get_last_error() -> str:
    return getattr(_tls, "message", "")


def get_last_status() -> Status:
    return getattr(_tls, "status", Status.SUCCESS)


def clear_error() -> None:
    _tls.status = Status.SUCCESS
    _tls.message = ""


def get_error_string(status) -> str:
    try:
        return _STATUS_STRINGS[Status(status)]
    except (ValueError, KeyError):
        return "Unknown status"
