"""Fused 2D RK2/RK4 marching stage kernels vs the jnp step (interpret).

The 2D sibling of tests/math/test_rk_fused.py: the chained stage kernels
must reproduce the jnp RK path's math term by term — periodic-interior
stencils (y-wrap rows via the pinned input), stage clamps, the
k-accumulator, the final periodic wrap on ALL variables (velocities
included), energy + Boussinesq + thermal faces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary.types import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step


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


def _compare(maker, params, f, steps=2, dt=1e-3):
    g = _grid()
    ref = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=False))
    fus = jax.jit(maker(g, params, dtype=jnp.float32,
                        use_pallas=True, pallas_interpret=True))
    fr, ff = f, f
    for i in range(steps):
        fr, rr = ref(fr, dt, i)
        ff, rf = fus(ff, dt, i)
        assert int(rr.status) == int(rf.status) == 0
    # atol=1e-7: the jnp path's coords come from float64 linspace cast to
    # f32, the kernel rebuilds y = ymin + j·dy in f32 from iota — 1-ulp
    # source diffs on some rows (same note as test_euler2d_fused).
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-7, err_msg=name)


@pytest.mark.parametrize("maker", [make_rk2_step, make_rk4_step],
                         ids=["rk2", "rk4"])
def test_rk2d_fused_default_sources(maker):
    """Default decaying sinusoidal sources: matches jnp to f32 coord ulp."""
    _compare(maker, NSParams(), _field(_grid(), seed=1))


@pytest.mark.parametrize("maker", [make_rk2_step, make_rk4_step],
                         ids=["rk2", "rk4"])
def test_rk2d_fused_convection(maker):
    """Energy + Boussinesq + mixed thermal faces over several steps."""
    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.NEUMANN,
        bottom=BCType.NEUMANN, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, top=295.0))
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    _compare(maker, params, _field(_grid(), seed=2, T0=300.0))


def test_rk2d_fused_periodic_thermal():
    """All-periodic thermal faces keep the plain wrap (no-ops)."""
    params = NSParams(alpha=5e-3, beta=0.02, T_ref=1.0,
                      gravity=(0.0, -1.0, 0.0),
                      thermal_bc=ThermalBCConfig())
    _compare(make_rk2_step, params, _field(_grid(), seed=3, T0=1.0))


def test_rk2d_gate_unsupported_shape_falls_back():
    """Off-lane nx (96 % 128 != 0) keeps the jnp path (no kernel built);
    stretched x/y now dispatches fused (tests/math/test_stretched2d_fused)."""
    g = Grid.uniform(96, 32)
    step = make_rk2_step(g, NSParams(), dtype=jnp.float32,
                         use_pallas=True, pallas_interpret=True)
    f = FlowField.initialize(g, dtype=jnp.float32)
    out, res = jax.jit(step)(f, 1e-3, 0)
    assert int(res.status) == 0
