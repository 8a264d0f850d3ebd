"""Library lifecycle: init / finalize / is_initialized.

Mirrors `src/core/cfd_init.c:1-35` — the reference guards global state with
an atomic CAS so any API entry point can lazily initialize.  Here the real
global state is JAX's backend, which initializes itself on first use; this
module keeps the same tri-state contract (and is where one-time setup such
as logging defaults would hook) so code written against the reference's
lifecycle maps one-to-one.
"""

from __future__ import annotations

import threading

from .status import Status

_lock = threading.Lock()
_initialized = False


def init() -> Status:
    """Idempotent global init (cfd_init).  Safe from any thread."""
    global _initialized
    with _lock:
        if not _initialized:
            # Touch the JAX backend so device discovery happens now rather
            # than mid-simulation (matches the reference doing its one-time
            # CPU-feature detection at init).
            import jax
            jax.devices()
            _initialized = True
    return Status.SUCCESS


def finalize() -> Status:
    """Tear down (cfd_finalize).  JAX owns its runtime; this resets the
    lazy-init flag so a subsequent init() re-runs discovery."""
    global _initialized
    with _lock:
        _initialized = False
    return Status.SUCCESS


def is_initialized() -> bool:
    return _initialized
