"""Stretched x/y grids through the fused 2D marching kernels —
interpret-mode consistency vs the jnp step.

The 2D sibling of tests/math/test_stretched_fused.py: the marching
engine streams y-blocks, so the stretch coefficients ride two input
kinds (`ops/pallas/stretch.stretch_inputs_2d`) — x-dependent weights as
ONE pinned (8, nx) row array, y-dependent weights as streamed plane
inputs.  Both ``nonuniform_scheme`` values are implemented in-kernel;
energy on stretched grids requires "consistent"
(`energy_solver.c:55-91`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary.types import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step

NY, NX = 32, 128


def _grid(beta=1.5):
    return Grid.stretched(NX, NY, beta=beta, stretch_axes="xy")


def _field(grid, seed=0, amp=0.2, T0=None):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32))
    if T0 is not None:
        f = f.replace(T=jnp.asarray(T0 + rng.normal(0, 1.0, grid.shape),
                                    jnp.float32))
    return f


def _assert_fields_close(fa, fb, atol, tag=""):
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fa, name)),
                                   np.asarray(getattr(fb, name)),
                                   atol=atol, err_msg=f"{name} {tag}")


def _compare(maker, params, f, steps=3, dt=5e-5, atol=2e-5):
    g = _grid()
    ref = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=False))
    fus = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True))
    fr, ff = f, f
    for i in range(steps):
        fr, rr = ref(fr, dt, i)
        ff, rf = fus(ff, dt, i)
        assert int(rr.status) == int(rf.status) == 0
    _assert_fields_close(ff, fr, atol)


@pytest.mark.parametrize("scheme", ["parity", "consistent"])
def test_stretched2d_euler_fused_matches_jnp(scheme):
    """Default decaying sinusoidal sources, both stencil schemes — the
    sin(πy)/sin(2πx) basis rides the coefficient inputs (per-point
    coords can't be rebuilt from iota·dy off uniform grids)."""
    params = NSParams(source_amplitude_u=0.1, source_amplitude_v=0.05,
                      nonuniform_scheme=scheme)
    _compare(make_euler_step, params, _field(_grid(), seed=1))


def test_stretched2d_euler_buoyancy_matches_jnp():
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      beta=0.2, T_ref=300.0, gravity=(0.0, -9.81, 0.0))
    _compare(make_euler_step, params, _field(_grid(), seed=2, T0=300.0),
             steps=1)


def test_stretched2d_euler_consistent_energy_matches_jnp():
    """Energy + Boussinesq + mixed thermal faces on a stretched 2D grid —
    requires the consistent scheme; the thermal stencils ride the same
    weight inputs as momentum."""
    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.NEUMANN,
        bottom=BCType.NEUMANN, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, top=295.0))
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal,
                      nonuniform_scheme="consistent")
    _compare(make_euler_step, params, _field(_grid(), seed=3, T0=300.0))


@pytest.mark.parametrize("maker", [make_rk2_step, make_rk4_step],
                         ids=["rk2", "rk4"])
def test_stretched2d_rk_fused_matches_jnp(maker):
    params = NSParams(source_amplitude_u=0.1, source_amplitude_v=0.05)
    _compare(maker, params, _field(_grid(), seed=4), steps=2, atol=5e-5)


@pytest.mark.heavy
def test_stretched2d_rk2_consistent_energy_matches_jnp():
    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    params = NSParams(alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal,
                      nonuniform_scheme="consistent")
    _compare(make_rk2_step, params, _field(_grid(), seed=5, T0=300.0),
             steps=2, atol=5e-5)


def test_stretched2d_parity_energy_raises():
    """Energy + stretched + parity scheme must raise (the parity thermal
    stencils are invalid off uniform grids) — never a silent fused-kernel
    term drop."""
    from cfd_tpu.core.status import CFDError
    with pytest.raises(CFDError):
        make_euler_step(_grid(), NSParams(alpha=0.1),
                        dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True)
