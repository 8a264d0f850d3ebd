"""Logging, error-state, and BC handler/backend-shim tests.

Mirrors tests/core/test_logging.c, test_error_handling.c, and the backend
availability checks of test_solver_backend_api.c.
"""

import pytest

from cfd_tpu.boundary import (BCBackend, BCErrorCode, get_backend,
                              get_backend_name, set_backend,
                              set_error_handler)
from cfd_tpu.boundary.handlers import report_error
from cfd_tpu.core import logging as clog
from cfd_tpu.core import status as cstatus
from cfd_tpu.core.features import Backend, backend_get_name, \
    backend_is_available


def test_log_level_filtering():
    seen = []
    clog.set_log_callback(lambda level, msg: seen.append((level, msg)))
    clog.set_log_level(clog.LogLevel.WARNING)
    try:
        clog.debug("test", "hidden")
        clog.warning("test", "visible %d", 7)
        clog.error("test", "also visible")
    finally:
        clog.set_log_callback(None)
        clog.set_log_level(clog.LogLevel.WARNING)
    assert len(seen) == 2
    assert "visible 7" in seen[0][1]
    assert seen[0][0] == int(clog.LogLevel.WARNING)


def test_extended_callback_gets_component():
    seen = []
    clog.set_log_callback_ex(lambda lvl, comp, msg: seen.append(comp))
    try:
        clog.error("poisson", "boom")
    finally:
        clog.set_log_callback_ex(None)
    assert seen == ["poisson"]


def test_thread_local_error_state():
    cstatus.clear_error()
    assert cstatus.get_last_status() == cstatus.Status.SUCCESS
    cstatus.set_error(cstatus.Status.ERROR_DIVERGED, "went bad")
    assert cstatus.get_last_status() == cstatus.Status.ERROR_DIVERGED
    assert cstatus.get_last_error() == "went bad"
    assert cstatus.get_error_string(
        cstatus.Status.ERROR_DIVERGED) == "Solver diverged"
    cstatus.clear_error()
    assert cstatus.get_last_error() == ""


def test_bc_error_handler():
    calls = []

    def handler(code, fn, msg, user_data):
        calls.append((code, fn, msg, user_data))

    set_error_handler(handler, user_data={"ctx": 1})
    try:
        report_error(BCErrorCode.INVALID, "bc_apply_inlet", "bad edge")
    finally:
        set_error_handler(None)
    assert calls == [(BCErrorCode.INVALID, "bc_apply_inlet", "bad edge",
                      {"ctx": 1})]


def test_bc_backend_selector():
    assert set_backend(BCBackend.SCALAR)
    assert get_backend() == BCBackend.SCALAR
    assert get_backend_name() == "scalar"
    assert set_backend(BCBackend.AUTO)
    import jax
    accel = any(d.platform != "cpu" for d in jax.devices())
    assert set_backend(BCBackend.CUDA) == accel
    set_backend(BCBackend.AUTO)


def test_ns_backend_availability():
    assert backend_is_available(Backend.SCALAR)
    assert backend_is_available(Backend.SIMD)
    assert backend_is_available(Backend.OMP)
    assert backend_get_name(Backend.CUDA) == "Accelerator"


def test_profiling_step_timer():
    from cfd_tpu.utils import StepTimer
    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    assert t.count == 3
    assert t.mlups(1000) > 0
    assert "3 steps" in t.summary()


def test_synchronized_time():
    import jax.numpy as jnp
    from cfd_tpu.utils import synchronized_time
    secs, out = synchronized_time(lambda x: x * 2, jnp.ones((8, 8)), reps=2)
    assert secs >= 0
    assert float(out[0, 0]) == 2.0
