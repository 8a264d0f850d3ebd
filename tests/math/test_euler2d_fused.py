"""Fused 2D Euler marching kernel vs the jnp step (interpret mode).

The 2D sibling of tests/math/test_euler_fused.py: the kernel must
reproduce the jnp step's math term by term — clamps, artificial pressure
coupling, per-point rho guards, the boundary dance (x in-kernel, y rows
at the wrapper level), energy + Boussinesq + thermal faces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary.types import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step


def _grid():
    return Grid.uniform(128, 32)


def _field(grid, seed=0, T0=None):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, 0.1, grid.shape), jnp.float32))
    if T0 is not None:
        f = f.replace(T=jnp.asarray(T0 + rng.normal(0, 1.0, grid.shape),
                                    jnp.float32))
    return f


def _compare(params, f, steps=3, seed_dt=1e-4):
    g = _grid()
    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fus = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=True, pallas_interpret=True))
    fr, ff = f, f
    for i in range(steps):
        fr, rr = ref(fr, seed_dt, i)
        ff, rf = fus(ff, seed_dt, i)
        assert int(rr.status) == int(rf.status) == 0
    # Not bit-equal by one ulp of the SOURCE COORDINATE: the jnp path's
    # grid coords come from float64 linspace cast to f32, the kernel
    # rebuilds y = ymin + j·dy in f32 from iota (kernels can't capture
    # array constants) — identical except on rows where the two roundings
    # differ by 1 ulp, giving |Δsource|·dt ≈ 1e-11-scale state diffs.
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-7, err_msg=name)


def test_euler2d_fused_default_sources():
    """Default decaying sinusoidal sources: bit-identical to jnp."""
    _compare(NSParams(), _field(_grid(), seed=1))


def test_euler2d_fused_convection():
    """Energy + Boussinesq + mixed thermal faces (Dirichlet/Neumann x,
    Neumann/Dirichlet y): bit-identical to jnp over several steps."""
    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.NEUMANN,
        bottom=BCType.NEUMANN, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, top=295.0))
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    _compare(params, _field(_grid(), seed=2, T0=300.0))


def test_euler2d_fused_periodic_thermal():
    """All-periodic thermal faces keep the plain wrap (no-ops)."""
    params = NSParams(alpha=5e-3, beta=0.02, T_ref=1.0,
                      gravity=(0.0, -1.0, 0.0),
                      thermal_bc=ThermalBCConfig())
    _compare(params, _field(_grid(), seed=3, T0=1.0))


def test_euler2d_gate_unsupported_shape_falls_back():
    """Off-lane nx (96 % 128 != 0) keeps the jnp path (no kernel built);
    stretched x/y now dispatches fused (tests/math/test_stretched2d_fused)."""
    g = Grid.uniform(96, 32)
    step = make_euler_step(g, NSParams(), dtype=jnp.float32,
                           use_pallas=True, pallas_interpret=True)
    f = FlowField.initialize(g, dtype=jnp.float32)
    out, res = jax.jit(step)(f, 1e-4, 0)
    assert int(res.status) == 0
