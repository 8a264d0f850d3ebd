"""The opt-in consistent nonuniform derivative scheme
(`NSParams.nonuniform_scheme="consistent"`, `common.spacing_operators`).

The reference's per-point forward-spacing stencils
(`solver_explicit_euler.c:409`) are only O(h)-consistent off uniform
grids — its own stretched example documents the limitation
(`poiseuille_stretched_grid.c:5-10`).  The consistent scheme is a
framework extension: exact 3-point nonuniform weights, identical to
parity on uniform grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cfd_tpu.ops.stencils as st
from cfd_tpu import FlowField, Grid
from cfd_tpu.core.status import CFDError
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.common import consistent_triples, spacing_operators
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.rk import make_rk2_step


def test_consistent_exact_for_quadratics():
    g = Grid.stretched(32, 24, beta=1.8)
    d1x, d1y, d2x, d2y, ok = spacing_operators(g, jnp.float64, "consistent")
    x, y = np.asarray(g.x), np.asarray(g.y)

    F = jnp.asarray((3.0 * x ** 2 + 2.0 * x + 1.0)[None, None, :]
                    * np.ones((1, 24, 1)))
    d2v = np.asarray(d2x(st.sx_m(F), F, st.sx_p(F)))[0, 5, 1:-1]
    np.testing.assert_allclose(d2v, 6.0, atol=1e-8)
    d1v = np.asarray(d1x(st.sx_m(F), F, st.sx_p(F)))[0, 5, 1:-1]
    np.testing.assert_allclose(d1v, 6.0 * x[1:-1] + 2.0, atol=1e-8)

    G2 = jnp.asarray((y ** 2 - 0.3 * y)[None, :, None] * np.ones((1, 1, 32)))
    d2yv = np.asarray(d2y(st.sy_m(G2), G2, st.sy_p(G2)))[0, 1:-1, 7]
    np.testing.assert_allclose(d2yv, 2.0, atol=1e-8)
    d1yv = np.asarray(d1y(st.sy_m(G2), G2, st.sy_p(G2)))[0, 1:-1, 7]
    np.testing.assert_allclose(d1yv, 2.0 * y[1:-1] - 0.3, atol=1e-8)


def test_parity_only_first_order_off_uniform():
    """The reference's forward-spacing d² is NOT exact for quadratics on
    a stretched grid — the asymmetry error the consistent scheme removes."""
    g = Grid.stretched(64, 8, beta=1.8)
    d1x, _, d2x, _, _ = spacing_operators(g, jnp.float64, "parity")
    x = np.asarray(g.x)
    F = jnp.asarray((x ** 2)[None, None, :] * np.ones((1, 8, 1)))
    d2v = np.asarray(d2x(st.sx_m(F), F, st.sx_p(F)))[0, 2, 1:-1]
    assert np.abs(d2v - 2.0).max() > 0.05


def test_uniform_consistent_is_parity_path():
    g = Grid.uniform(16, 16)
    a = spacing_operators(g, jnp.float64, "parity")
    b = spacing_operators(g, jnp.float64, "consistent")
    Z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16)))
    for i in range(4):
        np.testing.assert_array_equal(
            np.asarray(a[i](st.sx_m(Z), Z, st.sx_p(Z))),
            np.asarray(b[i](st.sx_m(Z), Z, st.sx_p(Z))))


def test_invalid_scheme_raises():
    with pytest.raises(CFDError):
        spacing_operators(Grid.uniform(8, 8), jnp.float64, "magic")


def test_triples_reduce_to_uniform_formulas():
    h = 0.125
    wm, wc, wp, lm, lc, lp = consistent_triples(np.full(15, h))
    np.testing.assert_allclose(wm, -1.0 / (2 * h))
    np.testing.assert_allclose(wc, 0.0, atol=1e-14)
    np.testing.assert_allclose(wp, 1.0 / (2 * h))
    np.testing.assert_allclose(lm, 1.0 / h ** 2)
    np.testing.assert_allclose(lc, -2.0 / h ** 2)
    np.testing.assert_allclose(lp, 1.0 / h ** 2)


@pytest.mark.parametrize("maker", [make_euler_step, make_rk2_step],
                         ids=["euler", "rk2"])
def test_consistent_step_runs_and_differs_on_stretched(maker):
    g = Grid.stretched(32, 24, zmin=0.0, zmax=1.0, nz=6, beta=1.5,
                       stretch_axes="xy")
    rng = np.random.default_rng(3)
    f = FlowField.initialize(g)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), f.u.dtype),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), f.u.dtype))
    outs = {}
    for scheme in ("parity", "consistent"):
        step = jax.jit(maker(g, NSParams(nonuniform_scheme=scheme),
                             use_pallas=False))
        fo, res = step(f, 5e-5, 0)
        assert int(res.status) == 0
        assert np.isfinite(np.asarray(fo.u)).all()
        outs[scheme] = np.asarray(fo.u)
    assert np.abs(outs["parity"] - outs["consistent"]).max() > 1e-12


def test_consistent_stretched_qualifies_for_fused_gates():
    """The fused kernels implement BOTH schemes (pinned weight planes),
    so consistent+stretched engages the fast paths — single-chip gate and
    the sharded reason function."""
    from cfd_tpu.parallel import make_mesh
    from cfd_tpu.parallel.fused import fused_sharded_euler_unsupported_reason
    from cfd_tpu.solvers.ns.common import stretch_mode

    g = Grid.stretched(128, 16, 24, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    p = NSParams(nonuniform_scheme="consistent")
    stretch, fuse_ok = stretch_mode(g, p)
    assert stretch is not None and fuse_ok
    assert fused_sharded_euler_unsupported_reason(
        g, p, make_mesh(axes=("z",)), jnp.float32) is None


@pytest.mark.parametrize(
    "maker", [make_euler_step,
              pytest.param(make_rk2_step, marks=pytest.mark.heavy)],
    ids=["euler", "rk2"])
def test_consistent_fused_matches_jnp(maker):
    """Interpret-mode fused kernels with the consistent weight pins vs
    the jnp consistent path on a stretched x/y grid."""
    g = Grid.stretched(128, 16, 8, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = NSParams(source_amplitude_u=0.08, source_amplitude_v=0.03,
                      nonuniform_scheme="consistent")
    ref = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=False))
    fus = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True))
    rng = np.random.default_rng(7)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))
    fr, rr = ref(f, 5e-5, 1)
    ff, rf = fus(f, 5e-5, 1)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-5, err_msg=name)


def test_consistent_convergence_order_on_stretched():
    """Truncation-error order on tanh-stretched grids, measured on sin:
    consistent ≈ O(h²) (smooth grading), parity ≈ O(h)."""
    def max_err(n, scheme):
        g = Grid.stretched(n, 8, beta=1.5)
        _, _, d2x, _, _ = spacing_operators(g, jnp.float64, scheme)
        x = np.asarray(g.x)
        F = jnp.asarray(np.sin(2 * np.pi * x)[None, None, :]
                        * np.ones((1, 8, 1)))
        got = np.asarray(d2x(st.sx_m(F), F, st.sx_p(F)))[0, 3, 1:-1]
        want = -(2 * np.pi) ** 2 * np.sin(2 * np.pi * x[1:-1])
        return np.abs(got - want).max()

    orders = {}
    for scheme in ("parity", "consistent"):
        e1, e2 = max_err(65, scheme), max_err(129, scheme)
        orders[scheme] = np.log2(e1 / e2)
    assert orders["consistent"] > 1.7, orders
    assert orders["parity"] < 1.3, orders


def test_energy_on_stretched_requires_consistent():
    """Reference parity: energy + stretched grid raises; the consistent
    scheme (extension) lifts the restriction (`energy_solver.c:55-91`)."""
    from cfd_tpu.solvers.energy import make_energy_step

    g = Grid.stretched(32, 24, beta=1.5)
    with pytest.raises(CFDError):
        make_energy_step(g, alpha=0.1)
    assert make_energy_step(g, alpha=0.1, scheme="consistent") is not None
    # z must stay uniform even in consistent mode
    gz = Grid.stretched(32, 24, 8, zmax=1.0, beta=1.5, stretch_axes="z")
    with pytest.raises(CFDError):
        make_energy_step(gz, alpha=0.1, scheme="consistent")


def test_energy_consistent_diffusion_exact_for_quadratic():
    """One energy step with u=v=w=0 on a stretched grid: the consistent
    Laplacian is exact for quadratic T, so dT = dt*alpha*(Txx+Tyy)."""
    from cfd_tpu.solvers.energy import make_energy_step

    g = Grid.stretched(32, 24, beta=1.8)
    alpha, dt = 0.3, 1e-3
    step = make_energy_step(g, alpha=alpha, scheme="consistent")
    x, y = np.asarray(g.x), np.asarray(g.y)
    T0 = (2.0 * x[None, None, :] ** 2 + 3.0 * y[None, :, None] ** 2
          + 0.5 * x[None, None, :] - y[None, :, None] + 300.0)
    T0 = jnp.asarray(np.broadcast_to(T0, (1, 24, 32)))
    z = jnp.zeros_like(T0)
    T1 = step(T0, z, z, z, dt, 0.0)
    dT = np.asarray(T1 - T0)[0, 1:-1, 1:-1]
    np.testing.assert_allclose(dT, dt * alpha * (2 * 2.0 + 2 * 3.0),
                               atol=1e-10)


def test_energy_consistent_advection_exact_for_linear():
    from cfd_tpu.solvers.energy import make_energy_step

    g = Grid.stretched(32, 24, beta=1.5)
    dt = 1e-3
    step = make_energy_step(g, alpha=1e-12, scheme="consistent")
    x, y = np.asarray(g.x), np.asarray(g.y)
    T0 = jnp.asarray(np.broadcast_to(
        4.0 * x[None, None, :] - 2.0 * y[None, :, None], (1, 24, 32)))
    u = jnp.full_like(T0, 0.7)
    v = jnp.full_like(T0, -0.2)
    w = jnp.zeros_like(T0)
    T1 = step(T0, u, v, w, dt, 0.0)
    dT = np.asarray(T1 - T0)[0, 1:-1, 1:-1]
    np.testing.assert_allclose(dT, -dt * (0.7 * 4.0 + (-0.2) * (-2.0)),
                               atol=1e-9)


def test_euler_convection_on_stretched_consistent_runs():
    """Full natural-convection configuration (Boussinesq + energy +
    thermal BCs) through the Euler integrator on a wall-clustered grid —
    impossible in the reference (energy requires uniform grids)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.stretched(48, 32, beta=1.5)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal,
                      nonuniform_scheme="consistent")
    step = jax.jit(make_euler_step(g, params))
    f = FlowField.initialize(g)
    f = f.replace(T=jnp.full_like(f.T, 300.0))
    for i in range(20):
        f, res = step(f, 5e-5, i)
    assert int(res.status) == 0
    T = np.asarray(f.T)
    assert np.isfinite(T).all()
    # Dirichlet walls hold their values; buoyancy has started a flow
    np.testing.assert_allclose(T[0, 1:-1, 0], 305.0)
    np.testing.assert_allclose(T[0, 1:-1, -1], 295.0)
    assert np.abs(np.asarray(f.v)).max() > 0.0


def test_consistent_stretched_euler_gradients_fd():
    """Reverse-mode gradients flow through the consistent weights
    (numpy build-time constants) — FD-checked on a 3-step rollout."""
    if not jax.config.jax_enable_x64:
        pytest.skip("needs float64 for the FD check")
    g = Grid.stretched(32, 24, beta=1.5)
    params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.0,
                      nonuniform_scheme="consistent")
    step = make_euler_step(g, params, differentiable=True)
    f0 = FlowField.initialize(g)

    def loss(u0):
        f = f0.replace(u=u0)
        for i in range(3):
            f, _ = step(f, 5e-5, i)
        return jnp.sum(f.u ** 2)

    gr = jax.grad(loss)(f0.u)
    eps = 1e-6
    du = jnp.zeros_like(f0.u).at[0, 10, 12].set(eps)
    fd = (loss(f0.u + du) - loss(f0.u - du)) / (2 * eps)
    np.testing.assert_allclose(float(gr[0, 10, 12]), float(fd), rtol=1e-6)


def _convection_params(scheme="consistent"):
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    return NSParams(
        source_amplitude_u=0.0, source_amplitude_v=0.0,
        alpha=1e-3, beta=0.05, T_ref=300.0, gravity=(0.0, -9.81, 0.0),
        thermal_bc=ThermalBCConfig(
            left=BCType.DIRICHLET, right=BCType.DIRICHLET,
            bottom=BCType.NEUMANN, top=BCType.NEUMANN,
            dirichlet_values=DirichletValues(left=305.0, right=295.0)),
        nonuniform_scheme=scheme)


@pytest.mark.parametrize(
    "maker", [make_euler_step,
              pytest.param(make_rk2_step, marks=pytest.mark.heavy)],
    ids=["euler", "rk2"])
def test_consistent_convection_fused_matches_jnp(maker):
    """Energy + Boussinesq + thermal BCs on a stretched grid through the
    fused kernels (consistent weights drive the thermal stencils too)."""
    g = Grid.stretched(128, 16, 8, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = _convection_params()
    ref = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=False))
    fus = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True))
    rng = np.random.default_rng(17)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  T=jnp.asarray(300 + rng.normal(0, 1, g.shape),
                                jnp.float32))
    fr, rr = ref(f, 5e-5, 1)
    ff, rf = fus(f, 5e-5, 1)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-5, err_msg=name)


def test_consistent_convection_sharded_matches_jnp():
    from cfd_tpu.parallel import make_mesh, make_sharded_step

    g = Grid.stretched(128, 16, 24, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = _convection_params()
    rng = np.random.default_rng(19)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  T=jnp.asarray(300 + rng.normal(0, 1, g.shape),
                                jnp.float32))
    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fr, rr = ref(f, 5e-5, 1)

    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 5e-5, 1)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)
    # T ~ 300 in f32: one ulp is 3.05e-5
    np.testing.assert_allclose(np.asarray(ff.T), np.asarray(fr.T),
                               atol=1e-4, err_msg="T")


def test_parity_stretched_energy_still_refuses_fused():
    """parity + stretched + energy must not engage the kernels (it raises
    in the solver factory before any kernel question arises)."""
    from cfd_tpu.ops.pallas.euler_kernels import make_euler_fused

    g = Grid.stretched(128, 16, 8, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    k = make_euler_fused(8, 16, 128, g.dx0, g.dy0, g.dz0, g.xmin, g.ymin,
                         0.01, 0.1, alpha=0.1,
                         stretch=(g.dx, g.dy, g.x, g.y), scheme="parity")
    assert k is None


def test_thermal_boundary_layer_stretched_beats_uniform():
    """Transient wall-heating boundary layer vs the analytic erfc
    solution T = T0 + dT*erfc(y / 2*sqrt(alpha*t)): at equal ny, the
    wall-clustered grid with the consistent thermal stencils is ~3x more
    accurate than uniform — the accuracy payoff the reference's stretched
    example promises but cannot deliver (its energy solver requires
    uniform grids)."""
    from jax import lax
    from scipy.special import erfc

    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.solvers.energy import apply_thermal_bcs, make_energy_step

    ALPHA, DT, STEPS = 1e-3, 1e-3, 1000   # t=1: delta = 0.063
    thermal = ThermalBCConfig(
        left=BCType.PERIODIC, right=BCType.PERIODIC,
        bottom=BCType.DIRICHLET, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(bottom=310.0, top=300.0))

    def rel_err(ny, beta):
        if beta:
            g = Grid.stretched(8, ny, ymax=1.0, beta=beta, stretch_axes="y")
            step = make_energy_step(g, ALPHA, scheme="consistent")
        else:
            g = Grid.uniform(8, ny, ymax=1.0)
            step = make_energy_step(g, ALPHA)
        T0 = apply_thermal_bcs(jnp.full((1, ny, 8), 300.0), thermal)
        z = jnp.zeros_like(T0)

        @jax.jit
        def go(T):
            def body(T, _):
                return apply_thermal_bcs(step(T, z, z, z, DT, 0.0),
                                         thermal), None
            return lax.scan(body, T, None, length=STEPS)[0]

        T = np.asarray(go(T0))[0, :, 4]
        y = np.asarray(g.y)
        exact = 300.0 + 10.0 * erfc(y / (2 * np.sqrt(ALPHA * STEPS * DT)))
        return np.abs(T - exact).max() / 10.0

    e_unif = rel_err(17, 0.0)
    e_str = rel_err(17, 1.5)
    assert e_str < 0.02, e_str
    assert e_str < e_unif / 2.5, (e_str, e_unif)


@pytest.mark.parametrize("scheme", ["parity", "consistent"])
def test_hybrid_differentiable_on_stretched(scheme):
    """differentiable=True + use_pallas=True on a stretched grid: fused
    forward (interpret here), jnp adjoint via `.hybrid.pair_vjp` — the
    gradient must match the pure-jnp differentiable step's."""
    g = Grid.stretched(128, 16, 8, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.0,
                      nonuniform_scheme=scheme)
    hybrid = make_euler_step(g, params, dtype=jnp.float32,
                             differentiable=True, use_pallas=True,
                             pallas_interpret=True)
    ref = make_euler_step(g, params, dtype=jnp.float32,
                          differentiable=True)
    f0 = FlowField.initialize(g, dtype=jnp.float32)

    def loss_of(step):
        def loss(u0):
            f, _ = step(f0.replace(u=u0), jnp.float32(5e-5), 0)
            return jnp.sum(f.u ** 2)
        return loss

    gh = jax.grad(loss_of(hybrid))(f0.u)
    gr = jax.grad(loss_of(ref))(f0.u)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gr),
                               atol=1e-5)
