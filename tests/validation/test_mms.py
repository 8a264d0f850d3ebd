"""Method of Manufactured Solutions tests (mirrors tests/math/test_mms.c).

Manufactured solution: modified Taylor-Green with decay rate α ≠ 2ν,
  u_m =  cos(x) sin(y) e^{−αt},  v_m = −sin(x) cos(y) e^{−αt},
which requires the forcing f = (2ν − α)·u_m — validating the source-callback
mechanism beyond the zero-source Taylor-Green case.  Reference parameters:
α = ν (`test_mms.c:36-37`).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import apply_periodic_scalar
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.ns.rk import make_rk2_step

NU = 0.01
ALPHA = NU  # source = (2ν − α)·u_m = ν·u_m


def make_source(alpha):
    def source(X, Y, Z, t):
        decay = jnp.exp(-alpha * t)
        su = (2 * NU - alpha) * jnp.cos(X) * jnp.sin(Y) * decay
        sv = -(2 * NU - alpha) * jnp.sin(X) * jnp.cos(Y) * decay
        return su, sv, jnp.zeros_like(su)
    return source


def run_mms(method, n, steps, dt):
    two_pi = 2 * np.pi
    grid = Grid.uniform(n, n, xmax=two_pi, ymax=two_pi)
    params = NSParams(dt=dt, mu=NU, max_iter=1,
                      source_func=make_source(ALPHA))
    maker = {"projection": make_projection_step, "rk2": make_rk2_step}[method]
    step = maker(grid, params)

    def one_step(field, i):
        field = field.replace(u=apply_periodic_scalar(field.u),
                              v=apply_periodic_scalar(field.v),
                              p=apply_periodic_scalar(field.p))
        field, res = step(field, dt, i)
        return field, res.status

    @jax.jit
    def run(field):
        return lax.scan(one_step, field, jnp.arange(steps))

    X = np.broadcast_to(np.asarray(grid.x)[None, None, :], grid.shape)
    Y = np.broadcast_to(np.asarray(grid.y)[None, :, None], grid.shape)
    u0 = np.cos(X) * np.sin(Y)
    v0 = -np.sin(X) * np.cos(Y)
    p0 = -0.25 * (np.cos(2 * X) + np.cos(2 * Y))
    f = FlowField(u=jnp.asarray(u0), v=jnp.asarray(v0),
                  w=jnp.zeros(grid.shape), p=jnp.asarray(p0),
                  rho=jnp.ones(grid.shape),
                  T=jnp.full(grid.shape, 300.0))
    field, statuses = run(f)
    assert (np.asarray(statuses) == 0).all()
    t = steps * dt
    u_exact = u0 * np.exp(-ALPHA * t)
    v_exact = v0 * np.exp(-ALPHA * t)
    eu = np.sqrt(((np.asarray(field.u) - u_exact) ** 2).sum()
                 / (u_exact ** 2).sum())
    ev = np.sqrt(((np.asarray(field.v) - v_exact) ** 2).sum()
                 / (v_exact ** 2).sum())
    return float(np.hypot(eu, ev))


def test_mms_source_mechanism():
    """With the manufactured forcing, the solution tracks the modified decay
    (which differs from the unforced TG decay)."""
    err = run_mms("projection", 33, 100, 1e-3)
    # Discretization-limited at 33² (relative L2 incl. the ghost shell is
    # ~0.1, as in the TG refinement table); the convergence test below is
    # the rigorous gate.
    assert err < 0.15, err
    # Sanity: without the source, the same field decays at 2ν ≠ α and the
    # mismatch at t=0.1 is measurably larger only over long horizons; the
    # tracked error above being small is the real gate.


def test_mms_spatial_convergence_projection():
    errs = []
    h_ref = 2 * np.pi / 63
    for n in (16, 32, 64):
        h = 2 * np.pi / (n - 1)
        dt = 5e-4 * (h / h_ref)
        steps = int(round(0.1 / dt))
        errs.append(run_mms("projection", n, steps, dt))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert errs[2] < errs[1] < errs[0], errs
    assert max(rates) > 1.4, (errs, rates)


def test_mms_rk2_runs_accurately():
    err = run_mms("rk2", 33, 100, 1e-3)
    assert err < 0.15, err
