"""Backend-consistency cavity run: fused Pallas path vs the jnp path over a
full lid-driven-cavity trajectory.

Analog of the reference's cross-backend strategy
(`tests/validation/test_cavity_backends.c:38-50`): all backends must agree on
the cavity solution to 0.1% of the lid speed. Here the two "backends" are the
mega-fused Pallas kernels (interpret mode on CPU; compiled on TPU) and the
pure-jnp XLA path, run side by side for many steps from the same state.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (DirichletValues, apply_dirichlet_scalar,
                              apply_neumann_scalar)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method

LID = 1.0
STEPS = 100
DT = 5e-4


def _cavity_runner(step, steps=STEPS):
    u_bc = DirichletValues(top=LID)
    v_bc = DirichletValues()

    def body(field, i):
        field = field.replace(
            u=apply_dirichlet_scalar(field.u, u_bc),
            v=apply_dirichlet_scalar(field.v, v_bc),
            p=apply_neumann_scalar(field.p))
        field, res = step(field, DT, i)
        return field, res.status

    @jax.jit
    def run(field):
        field, statuses = lax.scan(body, field,
                                   jnp.arange(steps, dtype=jnp.int32))
        return field, jnp.max(jnp.abs(statuses))

    return run


def test_cavity_fused_vs_jnp_trajectory():
    """100 cavity steps: fused and jnp trajectories agree to 0.1% of lid
    speed (the reference's cross-backend agreement bar)."""
    n = 128
    g = Grid.uniform(n, n)
    params = NSParams(mu=0.01,
                      source_amplitude_u=0.0, source_amplitude_v=0.0)

    run_jnp = _cavity_runner(jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT)))
    run_fus = _cavity_runner(jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT,
        use_pallas=True, pallas_interpret=True)))

    f0 = FlowField.quiescent(n, n, pressure=0.0, dtype=jnp.float32)
    f_jnp, bad_jnp = run_jnp(f0)
    f_fus, bad_fus = run_fus(f0)
    assert int(bad_jnp) == 0 and int(bad_fus) == 0

    # flow actually developed (not a trivially-zero comparison)
    assert float(jnp.max(jnp.abs(f_jnp.v))) > 1e-3

    for name in ("u", "v"):
        a = np.asarray(getattr(f_fus, name))
        b = np.asarray(getattr(f_jnp, name))
        assert np.max(np.abs(a - b)) < 1e-3 * LID, name
    assert np.max(np.abs(np.asarray(f_fus.p) - np.asarray(f_jnp.p))) < 5e-3
