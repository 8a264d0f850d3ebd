"""Pulsatile channel flow physics: a sinusoidally modulated inlet driving a
projection-solved channel conserves mass instantaneously (divergence-free
interior ⇒ outflux tracks influx through the cycle) and the outlet signal
oscillates at the inlet frequency.  The physics-level companion to the
BC-level full-cycle assertions in tests/boundary/test_boundary_deep.py
(reference anchor: `examples/pulsatile_inlet_flow.c`)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (DirichletValues, InletConfig, OutletConfig,
                              apply_dirichlet_scalar, apply_inlet,
                              apply_neumann_scalar, apply_outlet_velocity)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method

NX, NY = 64, 32
DT = 2.5e-4
FREQ = 8.0            # period 0.125 → one full cycle in 500 steps
STEPS = 1500


def _run():
    g = Grid.uniform(NX, NY, xmax=2.0, ymax=1.0)
    params = NSParams(mu=0.02, source_amplitude_u=0.0,
                      source_amplitude_v=0.0)
    step = make_projection_step(g, params,
                                poisson_method=Method.FFT_DIRECT)
    inlet = InletConfig.time_sinusoidal(u=1.0, v=0.0, frequency=FREQ,
                                        amplitude=0.5, phase=0.0,
                                        offset=1.0)
    outlet = OutletConfig()

    def body(field, i):
        t = i.astype(field.u.dtype) * DT
        u, v, w = apply_inlet(field.u, field.v, inlet, w=field.w, time=t,
                              dt=DT)
        u, v, w = apply_outlet_velocity(u, v, outlet, w=w, dt=DT)
        # no-slip WALLS only (top/bottom rows) — the inlet/outlet columns
        # keep their BC values
        u = u.at[0, 0, :].set(0.0).at[0, -1, :].set(0.0)
        v = v.at[0, 0, :].set(0.0).at[0, -1, :].set(0.0)
        field = field.replace(u=u, v=v, w=w,
                              p=apply_neumann_scalar(field.p))
        field, res = step(field, DT, i)
        influx = jnp.sum(field.u[0, 1:-1, 0])
        outflux = jnp.sum(field.u[0, 1:-1, -1])
        return field, (res.status, influx, outflux)

    @jax.jit
    def run(field):
        return lax.scan(body, field, jnp.arange(STEPS))

    f0 = FlowField.quiescent(NX, NY, pressure=0.0)
    field, (statuses, influx, outflux) = run(f0)
    return (np.asarray(statuses), np.asarray(influx), np.asarray(outflux))


def test_pulsatile_channel_mass_conservation_and_periodicity():
    statuses, influx, outflux = _run()
    assert (statuses == 0).all()

    # Skip the start-up transient (first two cycles).
    s = slice(STEPS - 500, None)
    scale = np.max(np.abs(influx[s]))
    assert scale > 0.1  # flow actually driven

    # Mass conservation: the projection scheme's splitting error and the
    # zero-gradient outlet's phase lag allow an instantaneous mismatch,
    # but the CYCLE-MEAN outflux must balance the cycle-mean influx.
    rel_inst = np.max(np.abs(outflux[s] - influx[s])) / scale
    assert rel_inst < 0.5, rel_inst
    mean_rel = abs(np.mean(outflux[s]) - np.mean(influx[s])) \
        / abs(np.mean(influx[s]))
    assert mean_rel < 0.10, mean_rel

    # The inlet signal modulates sinusoidally: influx max/min ratio matches
    # (offset ± amplitude) = 1.5 / 0.5 within discretization slack.
    ratio = np.max(influx[s]) / np.min(influx[s])
    assert 2.0 < ratio < 4.5, ratio

    # Periodicity: influx one full period apart agrees.
    period_steps = int(round(1.0 / FREQ / DT))
    a = influx[STEPS - 2 * period_steps:STEPS - period_steps]
    b = influx[STEPS - period_steps:]
    n = min(len(a), len(b))
    np.testing.assert_allclose(a[:n], b[:n], atol=0.05 * scale)
