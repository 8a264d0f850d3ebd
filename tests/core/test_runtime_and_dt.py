"""Core runtime / status / filesystem / features / CFL-dt depth tests.

Mirrors the reference's `tests/core/` unit tier (`test_cfd_init.c`,
`test_error_handling.c`, `test_cfl_timestep.c`, filesystem tests) at the
same granularity: every status code has a string, init is idempotent,
run-dir naming is exact, and compute_dt reproduces the documented formula
with its floors/caps (`solver_explicit_euler.c:162-229`).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.core import runtime
from cfd_tpu.core.features import Backend, backend_get_name, backend_is_available
from cfd_tpu.core.filesystem import (create_run_directory,
                                     ensure_directory_exists,
                                     make_run_dir_name)
from cfd_tpu.core.status import (CFDError, Status, clear_error,
                                 get_error_string, get_last_error,
                                 get_last_status, set_error)
from cfd_tpu.solvers.energy import thermal_dt_limit
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.common import compute_dt
from cfd_tpu.solvers.ns.params import DT_MAX_LIMIT, DT_MIN_LIMIT


# ---------------------------------------------------------------- runtime

def test_init_idempotent_and_finalize_resets():
    assert runtime.init() == Status.SUCCESS
    assert runtime.is_initialized()
    assert runtime.init() == Status.SUCCESS  # second init is a no-op
    assert runtime.finalize() == Status.SUCCESS
    assert not runtime.is_initialized()
    assert runtime.init() == Status.SUCCESS  # re-init after finalize works
    assert runtime.is_initialized()


# ----------------------------------------------------------------- status

def test_every_status_code_has_a_distinct_string():
    seen = set()
    for st in Status:
        s = get_error_string(st)
        assert isinstance(s, str) and s, st
        assert s not in seen, f"duplicate string for {st}"
        seen.add(s)


def test_unknown_status_value_is_handled():
    # get_error_string on a raw int outside the enum must not raise
    s = get_error_string(-999)
    assert isinstance(s, str) and s


def test_last_error_set_get_clear():
    clear_error()
    assert get_last_status() == Status.SUCCESS
    set_error(Status.ERROR_INVALID, "bad nx")
    assert get_last_status() == Status.ERROR_INVALID
    assert "bad nx" in get_last_error()
    clear_error()
    assert get_last_status() == Status.SUCCESS
    assert get_last_error() == ""


def test_cfd_error_carries_status():
    err = CFDError(Status.ERROR_NOT_FOUND, "no such solver")
    assert err.status == Status.ERROR_NOT_FOUND
    assert "no such solver" in str(err)


# ------------------------------------------------------------- filesystem

def test_run_dir_name_format_exact():
    # {prefix}_{nx}x{ny}_{YYYYmmdd_HHMMSS} (`filesystem.c:179-194`)
    import time
    ts = time.mktime((2026, 8, 16, 12, 34, 56, 0, 0, -1))
    name = make_run_dir_name("cavity", 128, 64, timestamp=ts)
    assert name == "cavity_128x64_20260816_123456"


def test_create_run_directory_layout(tmp_path):
    d = create_run_directory(str(tmp_path), "sim", 32, 16)
    assert os.path.isdir(d)
    assert os.path.dirname(os.path.dirname(d)) == str(tmp_path)
    assert os.path.basename(os.path.dirname(d)) == "output"
    assert os.path.basename(d).startswith("sim_32x16_")


def test_ensure_directory_exists_failure_path(tmp_path):
    blocker = tmp_path / "a_file"
    blocker.write_text("x")
    # a path that routes THROUGH a regular file cannot be created
    assert not ensure_directory_exists(str(blocker / "sub"))
    assert ensure_directory_exists(str(tmp_path / "ok" / "nested"))


# --------------------------------------------------------------- features

def test_backend_names_and_availability():
    for b in Backend:
        assert isinstance(backend_get_name(b), str)
    # the XLA path is the "scalar always available" analog
    assert backend_is_available(Backend.SCALAR)


# ----------------------------------------------------------- CFL timestep

def _grid2d(n=32):
    return Grid.uniform(n, n)


def test_compute_dt_quiescent_floors_speed_at_one():
    """Zero velocity and zero pressure → max_speed floored at 1, so
    dt = clip(cfl·dmin, limits)."""
    g = _grid2d()
    params = NSParams()
    f = FlowField.quiescent(g.nx, g.ny, pressure=0.0)
    f = f.replace(rho=jnp.ones_like(f.rho))
    dt = compute_dt(f, g, params)
    dmin = float(np.min(np.asarray(g.dx)))
    expected = max(DT_MIN_LIMIT, min(DT_MAX_LIMIT, params.cfl * dmin))
    assert dt == pytest.approx(expected, rel=1e-12)


def test_compute_dt_formula_with_flow():
    """dt = cfl·dmin / max(|u| + c), c = sqrt(gamma·p/rho)."""
    g = _grid2d()
    params = NSParams()
    f = FlowField.quiescent(g.nx, g.ny, pressure=1.0, density=1.0)
    f = f.replace(u=jnp.full(f.u.shape, 3.0))
    dt = compute_dt(f, g, params)
    c = np.sqrt(params.gamma * 1.0 / 1.0)
    dmin = float(np.min(np.asarray(g.dx)))
    expected = max(DT_MIN_LIMIT, min(DT_MAX_LIMIT,
                                     params.cfl * dmin / (3.0 + c)))
    assert dt == pytest.approx(expected, rel=1e-6)


def test_compute_dt_caps():
    g = Grid.uniform(4, 4, xmax=1000.0, ymax=1000.0)  # huge spacing
    params = NSParams()
    f = FlowField.quiescent(g.nx, g.ny, pressure=0.0)
    assert compute_dt(f, g, params) == DT_MAX_LIMIT

    g2 = Grid.uniform(16, 16)
    f2 = FlowField.quiescent(16, 16, pressure=1e12, density=1.0)
    assert compute_dt(f2, g2, params) == DT_MIN_LIMIT


def test_compute_dt_thermal_bound_engages():
    """Large alpha makes the diffusion bound dmin²/(2·α·ndim)·cfl binding."""
    g = _grid2d()
    params = NSParams(alpha=100.0)
    f = FlowField.quiescent(g.nx, g.ny, pressure=0.0)
    dt = compute_dt(f, g, params)
    dmin = float(np.min(np.asarray(g.dx)))
    bound = thermal_dt_limit(100.0, dmin, 2, params.cfl)
    assert dt == pytest.approx(max(DT_MIN_LIMIT, bound), rel=1e-12)
    # and alpha<=0 disables the bound entirely
    assert thermal_dt_limit(0.0, dmin, 2, params.cfl) == float("inf")


def test_compute_dt_3d_uses_dz():
    """A 3D grid with the finest spacing along z must pick dz as dmin."""
    params = NSParams()
    g = Grid.uniform(16, 16, 64, zmin=0.0, zmax=0.1)  # dz ≈ 0.0016, finest
    f = FlowField.quiescent(16, 16, 64, pressure=0.0)
    dt = compute_dt(f, g, params)
    dz = float(np.min(np.asarray(g.dz)))
    assert dt == pytest.approx(max(DT_MIN_LIMIT,
                                   min(DT_MAX_LIMIT, params.cfl * dz)),
                               rel=1e-12)


def test_compute_dt_stretched_grid_uses_min_spacing():
    g = Grid.stretched(33, 33, beta=2.0)
    params = NSParams()
    f = FlowField.quiescent(33, 33, pressure=0.0)
    dt = compute_dt(f, g, params)
    dmin = min(float(np.min(np.asarray(g.dx))),
               float(np.min(np.asarray(g.dy))))
    assert dt == pytest.approx(max(DT_MIN_LIMIT,
                                   min(DT_MAX_LIMIT, params.cfl * dmin)),
                               rel=1e-12)
