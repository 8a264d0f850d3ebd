"""Ensemble simulation via vmap: batched initial conditions, batched
physics parameters (a viscosity sweep through the step factory), and
batched adjoints (vmap-of-grad sensitivities) — all in ONE compiled XLA
program.

Extension component — the C reference runs one simulation per process
(`simulation_api.c:24-127` owns a single grid/field/solver); parameter
sweeps there are shell loops over program invocations.  On TPU an
ensemble is a leading batch axis: `jax.vmap` lifts the whole step (or a
multi-step rollout, or its gradient) so every member shares one compile
and the MXU/VPU see batched work.  The factories are vmap-safe because
they never branch on traced parameter *values* (the "no jnp constants at
factory build time" rule, docs/design.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import (NSParams, make_euler_step,
                                make_projection_step, make_rk2_step,
                                make_rollout)
from cfd_tpu.solvers.poisson.base import Method, PoissonParams

TIGHT = PoissonParams(tolerance=1e-12, absolute_tolerance=1e-13,
                      max_iterations=4000)


def _grid():
    return Grid.uniform(17, 17, xmin=0, xmax=2 * np.pi,
                        ymin=0, ymax=2 * np.pi)


def _tg(grid, amp):
    X, Y, _ = grid.coordinate_arrays(jnp.float64)
    return FlowField.quiescent(grid.nx, grid.ny, 1).replace(
        u=amp * jnp.cos(X) * jnp.sin(Y),
        v=-amp * jnp.sin(X) * jnp.cos(Y))


def _stack(fields):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *fields)


def test_vmap_euler_step_matches_member_loop():
    g = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_euler_step(g, params, use_pallas=False)
    members = [_tg(g, a) for a in (0.1, 0.2, 0.3, 0.4)]

    batched = jax.vmap(lambda f: step(f, 1e-4, 0))
    out_b, res_b = batched(_stack(members))

    for i, f in enumerate(members):
        out_i, res_i = step(f, 1e-4, 0)
        for name in ("u", "v", "p"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_b, name)[i]),
                np.asarray(getattr(out_i, name)), err_msg=name)
        assert int(res_b.status[i]) == int(res_i.status)


def test_vmap_viscosity_sweep_through_factory():
    """The sweep axis is a *physics parameter*: the factory is called once
    under vmap with a traced mu and every member integrates its own
    viscosity (rollout included)."""
    g = _grid()
    mus = jnp.asarray([0.02, 0.05, 0.1])
    f0 = _tg(g, 0.3)

    def run(mu):
        params = NSParams(mu=mu, source_amplitude_u=0.0,
                          source_amplitude_v=0.0)
        step = make_rk2_step(g, params, use_pallas=False)
        roll = make_rollout(step, 5)
        f, _ = roll(f0, 1e-3)
        return f.u

    u_b = jax.jit(jax.vmap(run))(mus)
    for i, mu in enumerate(np.asarray(mus)):
        np.testing.assert_allclose(np.asarray(u_b[i]),
                                   np.asarray(run(jnp.asarray(mu))),
                                   rtol=1e-12, atol=1e-14)
    # more viscous members decay faster
    ke = np.sum(np.asarray(u_b) ** 2, axis=(1, 2, 3))
    assert ke[0] > ke[1] > ke[2]


def test_vmap_projection_step_with_cg():
    """vmap through the projection step's CG while_loop (batched iterative
    pressure solve: the loop runs until every member converges)."""
    g = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_projection_step(g, params, poisson_method=Method.CG,
                                poisson_params=TIGHT, use_pallas=False)
    members = [_tg(g, a) for a in (0.1, 0.3)]

    out_b, res_b = jax.jit(jax.vmap(lambda f: step(f, 1e-3, 0)))(
        _stack(members))
    for i, f in enumerate(members):
        out_i, _ = step(f, 1e-3, 0)
        for name in ("u", "v", "p"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_b, name)[i]),
                np.asarray(getattr(out_i, name)),
                rtol=1e-9, atol=1e-11, err_msg=name)


def test_vmap_of_grad_batched_sensitivities():
    """Batched adjoints: d(loss)/d(mu) for every ensemble member in one
    program equals the per-member gradients."""
    g = _grid()
    f0 = _tg(g, 0.3)

    def loss(mu):
        params = NSParams(mu=mu, source_amplitude_u=0.0,
                          source_amplitude_v=0.0)
        step = make_euler_step(g, params, use_pallas=False)
        roll = make_rollout(step, 4, remat="step")
        f, _ = roll(f0, 1e-3)
        return 0.5 * jnp.sum(f.u ** 2 + f.v ** 2)

    mus = jnp.asarray([0.02, 0.05, 0.1])
    g_b = jax.jit(jax.vmap(jax.grad(loss)))(mus)
    for i, mu in enumerate(np.asarray(mus)):
        np.testing.assert_allclose(float(g_b[i]),
                                   float(jax.grad(loss)(jnp.asarray(mu))),
                                   rtol=1e-11)
    assert np.all(np.asarray(g_b) < 0)  # more viscosity -> less energy
