"""Boundary-condition tests.

Mirrors tests/core/test_boundary_conditions*.c — one scenario per BC type,
2D and 3D, plus corner-ownership and save/restore semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField
from cfd_tpu.boundary import (BCType, DirichletValues, Edge, InletConfig,
                              OutletConfig, SymmetryConfig, apply_inlet,
                              apply_neumann_scalar, apply_noslip,
                              apply_outlet_scalar, apply_periodic_field,
                              apply_periodic_scalar, apply_scalar,
                              apply_symmetry, copy_boundary_velocities)
from cfd_tpu.core.status import CFDError


def grid_field(nx=6, ny=5, nz=1, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(nz, ny, nx)))


def test_periodic_scalar_2d():
    f = grid_field()
    g = np.asarray(apply_periodic_scalar(f))
    fa = np.asarray(f)
    # After y-face application corners come from the y-wrap of the x-wrapped
    # field; check the pure edge segments.
    np.testing.assert_array_equal(g[:, 1:-1, 0], fa[:, 1:-1, -2])
    np.testing.assert_array_equal(g[:, 1:-1, -1], fa[:, 1:-1, 1])
    np.testing.assert_array_equal(g[:, 0, 1:-1], fa[:, -2, 1:-1])
    np.testing.assert_array_equal(g[:, -1, 1:-1], fa[:, 1, 1:-1])


def test_neumann_scalar_2d():
    f = grid_field()
    g = np.asarray(apply_neumann_scalar(f))
    fa = np.asarray(f)
    np.testing.assert_array_equal(g[:, 1:-1, 0], fa[:, 1:-1, 1])
    np.testing.assert_array_equal(g[:, 1:-1, -1], fa[:, 1:-1, -2])
    np.testing.assert_array_equal(g[:, 0, 1:-1], fa[:, 1, 1:-1])
    np.testing.assert_array_equal(g[:, -1, 1:-1], fa[:, -2, 1:-1])


def test_neumann_3d_z_faces():
    f = grid_field(5, 5, 4)
    g = np.asarray(apply_neumann_scalar(f))
    np.testing.assert_array_equal(g[0, 1:-1, 1:-1], g[1, 1:-1, 1:-1])
    np.testing.assert_array_equal(g[-1, 1:-1, 1:-1], g[-2, 1:-1, 1:-1])


def test_dirichlet_corner_ownership():
    """y-faces overwrite x-face corners; z-faces win in 3D (reference order)."""
    f = grid_field(5, 5, 1)
    vals = DirichletValues(left=1.0, right=2.0, top=3.0, bottom=4.0)
    g = np.asarray(apply_scalar(f, BCType.DIRICHLET, vals))
    assert g[0, 0, 0] == 4.0  # bottom wins over left
    assert g[0, -1, -1] == 3.0  # top wins over right
    np.testing.assert_array_equal(g[0, 1:-1, 0], 1.0)
    np.testing.assert_array_equal(g[0, 1:-1, -1], 2.0)


def test_noslip_zeroes_all_faces():
    u, v = grid_field(seed=1), grid_field(seed=2)
    un, vn = apply_noslip(u, v)
    un, vn = np.asarray(un), np.asarray(vn)
    for arr in (un, vn):
        np.testing.assert_array_equal(arr[:, :, 0], 0.0)
        np.testing.assert_array_equal(arr[:, :, -1], 0.0)
        np.testing.assert_array_equal(arr[:, 0, :], 0.0)
        np.testing.assert_array_equal(arr[:, -1, :], 0.0)
    # Interior untouched
    np.testing.assert_array_equal(un[:, 1:-1, 1:-1], np.asarray(u)[:, 1:-1, 1:-1])


def test_inlet_uniform_left():
    u, v = grid_field(8, 7), grid_field(8, 7, seed=3)
    cfg = InletConfig.uniform(2.5, -0.5)
    un, vn = apply_inlet(u, v, cfg)
    np.testing.assert_allclose(np.asarray(un)[:, :, 0], 2.5)
    np.testing.assert_allclose(np.asarray(vn)[:, :, 0], -0.5)


def test_inlet_parabolic_profile():
    u, v = grid_field(8, 9), grid_field(8, 9, seed=3)
    cfg = InletConfig.parabolic(3.0)
    un, _ = apply_inlet(u, v, cfg)
    prof = np.asarray(un)[0, :, 0]
    # 4 s (1-s): zero at walls, max at center
    assert prof[0] == 0.0 and prof[-1] == 0.0
    np.testing.assert_allclose(prof[4], 3.0)  # s=0.5 at j=4 of 9
    s = np.arange(9) / 8.0
    np.testing.assert_allclose(prof, 3.0 * 4 * s * (1 - s))


def test_inlet_magnitude_dir():
    u, v = grid_field(), grid_field(seed=5)
    cfg = InletConfig.magnitude_dir(2.0, np.pi / 2)
    un, vn = apply_inlet(u, v, cfg)
    np.testing.assert_allclose(np.asarray(un)[:, :, 0], 0.0, atol=1e-15)
    np.testing.assert_allclose(np.asarray(vn)[:, :, 0], 2.0)


def test_inlet_mass_flow():
    u, v = grid_field(), grid_field(seed=5)
    cfg = InletConfig.mass_flow(2.0, density=4.0, inlet_length=0.5)
    un, vn = apply_inlet(u, v, cfg)
    np.testing.assert_allclose(np.asarray(un)[:, :, 0], 1.0)  # 2/(4*0.5)
    np.testing.assert_allclose(np.asarray(vn)[:, :, 0], 0.0)


def test_inlet_custom_profile_traceable():
    u, v = grid_field(6, 11), grid_field(6, 11, seed=4)

    def prof(position):
        return jnp.sin(jnp.pi * position), jnp.zeros_like(position)

    cfg = InletConfig.custom(prof)
    un, _ = apply_inlet(u, v, cfg)
    s = np.arange(11) / 10.0
    np.testing.assert_allclose(np.asarray(un)[0, :, 0], np.sin(np.pi * s),
                               atol=1e-12)


def test_inlet_time_sinusoidal():
    u, v = grid_field(), grid_field(seed=6)
    cfg = InletConfig.time_sinusoidal(1.0, 0.0, frequency=1.0, amplitude=0.5,
                                      phase=0.0, offset=1.0)
    un, _ = apply_inlet(u, v, cfg, time=0.25, dt=0.01)  # sin(pi/2)=1
    np.testing.assert_allclose(np.asarray(un)[:, :, 0], 1.5, rtol=1e-12)


def test_inlet_time_ramp_and_step():
    u, v = grid_field(), grid_field(seed=6)
    ramp = InletConfig.time_ramp(2.0, 0.0, t_start=0.0, t_end=1.0,
                                 value_start=0.0, value_end=1.0)
    un, _ = apply_inlet(u, v, ramp, time=0.5, dt=0.01)
    np.testing.assert_allclose(np.asarray(un)[:, :, 0], 1.0)
    step = InletConfig.time_step(2.0, 0.0, t_step=1.0, value_before=0.25,
                                 value_after=1.0)
    un, _ = apply_inlet(u, v, step, time=0.5, dt=0.01)
    np.testing.assert_allclose(np.asarray(un)[:, :, 0], 0.5)
    un, _ = apply_inlet(u, v, step, time=1.5, dt=0.01)
    np.testing.assert_allclose(np.asarray(un)[:, :, 0], 2.0)


def test_inlet_time_constant_delegates():
    """CONSTANT time profile == plain inlet (bc_apply_inlet_time delegation)."""
    u, v = grid_field(), grid_field(seed=6)
    cfg = InletConfig.uniform(1.0, 0.5)
    a = apply_inlet(u, v, cfg)
    b = apply_inlet(u, v, cfg, time=3.0, dt=0.1)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_outlet_zero_gradient_right():
    f = grid_field()
    g = np.asarray(apply_outlet_scalar(f, OutletConfig.zero_gradient()))
    np.testing.assert_array_equal(g[:, :, -1], np.asarray(f)[:, :, -2])


def test_outlet_convective_defaults_to_zero_gradient():
    """Reference behavior: convective config applies zero-gradient
    (`boundary_conditions_outlet_scalar.c:33-37`)."""
    f = grid_field()
    g = np.asarray(apply_outlet_scalar(f, OutletConfig.convective(1.0)))
    np.testing.assert_array_equal(g[:, :, -1], np.asarray(f)[:, :, -2])


def test_outlet_true_convective_extension():
    f = grid_field()
    cfg = OutletConfig.convective(1.0, true_convective=True)
    g = np.asarray(apply_outlet_scalar(f, cfg, dt=0.1, dn=0.5))
    fa = np.asarray(f)
    expected = fa[:, :, -1] - 0.2 * (fa[:, :, -1] - fa[:, :, -2])
    np.testing.assert_allclose(g[:, :, -1], expected)


def test_symmetry_2d():
    u, v = grid_field(), grid_field(seed=7)
    cfg = SymmetryConfig(edges=Edge.LEFT | Edge.TOP)
    un, vn = apply_symmetry(u, v, cfg)
    un, vn = np.asarray(un), np.asarray(vn)
    np.testing.assert_array_equal(un[:, :, 0], 0.0)          # u=0 at x-plane
    # top edge applied after left, so exclude the shared corner row
    np.testing.assert_array_equal(vn[:, :-1, 0], np.asarray(v)[:, :-1, 1])
    np.testing.assert_array_equal(vn[:, -1, :], 0.0)         # v=0 at y-plane
    # u at top copied from interior of the already-left-modified u
    np.testing.assert_array_equal(un[:, -1, 1:], un[:, -2, 1:])


def test_symmetry_3d_z_faces():
    u, v, w = grid_field(5, 5, 4), grid_field(5, 5, 4, 1), grid_field(5, 5, 4, 2)
    cfg = SymmetryConfig(edges=Edge.BACK | Edge.FRONT)
    un, vn, wn = apply_symmetry(u, v, cfg, w=w)
    wn = np.asarray(wn)
    np.testing.assert_array_equal(wn[0], 0.0)
    np.testing.assert_array_equal(wn[-1], 0.0)
    np.testing.assert_array_equal(np.asarray(un)[0], np.asarray(un)[1])


def test_apply_periodic_field_all_vars():
    field = FlowField.initialize.__wrapped__ if False else None
    from cfd_tpu import Grid
    g = Grid.uniform(6, 5)
    f = FlowField.initialize(g)
    f2 = apply_periodic_field(f)
    np.testing.assert_array_equal(np.asarray(f2.p)[:, 1:-1, 0],
                                  np.asarray(f.p)[:, 1:-1, -2])
    np.testing.assert_array_equal(np.asarray(f2.T)[:, 1:-1, -1],
                                  np.asarray(f.T)[:, 1:-1, 1])


def test_copy_boundary_velocities_2d_skips_w():
    u1, v1, w1 = grid_field(), grid_field(seed=1), grid_field(seed=2)
    u2, v2, w2 = grid_field(seed=3), grid_field(seed=4), grid_field(seed=5)
    du, dv, dw = copy_boundary_velocities(u1, v1, w1, u2, v2, w2)
    np.testing.assert_array_equal(np.asarray(du)[:, 0, :], np.asarray(u2)[:, 0, :])
    np.testing.assert_array_equal(np.asarray(dv)[:, 1:-1, -1],
                                  np.asarray(v2)[:, 1:-1, -1])
    # interior untouched
    np.testing.assert_array_equal(np.asarray(du)[:, 1:-1, 1:-1],
                                  np.asarray(u1)[:, 1:-1, 1:-1])
    # w untouched in 2D (reference copies w only when nz > 1)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(w1))


def test_invalid_configs_raise():
    u, v = grid_field(), grid_field(seed=1)
    with pytest.raises(CFDError):
        apply_inlet(u, v, InletConfig(edge=Edge.LEFT | Edge.RIGHT))
    with pytest.raises(CFDError):
        apply_outlet_scalar(u, OutletConfig(edge=Edge.FRONT))  # 2D field
    with pytest.raises(CFDError):
        apply_scalar(u, BCType.INLET)


def test_2d_raw_array_api():
    """The reference's 2D raw-array API (bc_apply_scalar on (ny,nx))."""
    rng = np.random.default_rng(3)
    f2 = jnp.asarray(rng.normal(size=(5, 7)))
    g = apply_neumann_scalar(f2)
    assert g.shape == (5, 7)
    np.testing.assert_array_equal(np.asarray(g)[1:-1, 0],
                                  np.asarray(f2)[1:-1, 1])
    p = apply_periodic_scalar(f2)
    assert p.shape == (5, 7)
    np.testing.assert_array_equal(np.asarray(p)[1:-1, 0],
                                  np.asarray(f2)[1:-1, -2])
    from cfd_tpu.boundary import apply_dirichlet_scalar as ads
    d = ads(f2, DirichletValues(top=9.0))
    np.testing.assert_allclose(np.asarray(d)[-1, :], 9.0)


def test_thermal_z_specs_mapping():
    """The shared z-face spec helper: DIRICHLET -> value, NEUMANN/PERIODIC
    -> per-vocabulary tokens, back <-> low face, front <-> high face."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig, thermal_z_specs)

    cfg = ThermalBCConfig(back=BCType.DIRICHLET, front=BCType.NEUMANN,
                          dirichlet_values=DirichletValues(back=310.0))
    assert thermal_z_specs(cfg) == (310.0, "neumann")
    assert thermal_z_specs(cfg, periodic=("pN2", "p1"),
                           neumann=("p1", "pN2")) == (310.0, "pN2")
    per = ThermalBCConfig()
    assert thermal_z_specs(per) == ("periodic", "periodic")
    assert thermal_z_specs(per, periodic=("pN2", "p1"),
                           neumann=("p1", "pN2")) == ("pN2", "p1")
