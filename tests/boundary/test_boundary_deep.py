"""Deep boundary-condition tests: full-cycle time modulation, z-face inlets,
convective-outlet physics, and BCs inside jitted step loops.

Mirrors the depth of the reference's 1521-line inlet suite
(`tests/core/test_boundary_conditions_inlet.c`) and the convective-outlet
semantics of `boundary_conditions_outlet_common.h`.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.boundary import (Edge, InletConfig, OutletConfig, apply_inlet,
                              apply_outlet_scalar)
from cfd_tpu.boundary.types import OutletType, TimeProfile


def fields3d(nz=4, ny=8, nx=10, val=0.5):
    shape = (nz, ny, nx)
    return (jnp.full(shape, val), jnp.full(shape, -val), jnp.full(shape, val))


# ---------------------------------------------------------------------------
# Full-cycle sinusoidal inlet
# ---------------------------------------------------------------------------


def test_sinusoidal_inlet_full_cycle():
    """The inlet velocity must track offset + A·sin(2πft + φ) over a whole
    period, at every point of the parabolic profile — not just one instant
    (`boundary_conditions_time.h:20-60` modulation semantics)."""
    freq, amp, phase, offset = 2.0, 0.6, 0.3, 1.0
    u_max = 1.5
    cfg = InletConfig.parabolic(u_max, edge=Edge.LEFT).with_time_sinusoidal(
        frequency=freq, amplitude=amp, phase=phase, offset=offset)
    ny = 17
    u0 = jnp.zeros((1, ny, 12))
    v0 = jnp.zeros((1, ny, 12))
    pos = np.arange(ny) / (ny - 1)
    profile = u_max * 4.0 * pos * (1.0 - pos)

    period = 1.0 / freq
    for t in np.linspace(0.0, period, 13):
        u, v = apply_inlet(u0, v0, cfg, time=t, dt=1e-3)
        mod = offset + amp * math.sin(2.0 * math.pi * freq * t + phase)
        np.testing.assert_allclose(np.asarray(u)[0, :, 0], profile * mod,
                                   rtol=1e-5, atol=1e-6)
        # v-component of a pure-u inlet stays zero under modulation
        np.testing.assert_allclose(np.asarray(v)[0, :, 0], 0.0, atol=1e-12)
    # periodicity: t and t+period give identical boundaries
    u_a, _ = apply_inlet(u0, v0, cfg, time=0.37, dt=1e-3)
    u_b, _ = apply_inlet(u0, v0, cfg, time=0.37 + period, dt=1e-3)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b), rtol=1e-5,
                               atol=1e-7)


def test_sinusoidal_inlet_mean_over_cycle():
    """Integrating the modulator over one period leaves the offset — the
    pulsatile-flow invariant `examples/pulsatile_inlet_flow.c` builds on."""
    cfg = InletConfig.uniform(2.0, 0.0).with_time_sinusoidal(
        frequency=1.0, amplitude=0.5, phase=0.0, offset=1.0)
    u0 = jnp.zeros((1, 9, 8))
    v0 = jnp.zeros_like(u0)
    ts = np.linspace(0.0, 1.0, 200, endpoint=False)
    vals = []
    for t in ts:
        u, _ = apply_inlet(u0, v0, cfg, time=t, dt=1e-3)
        vals.append(float(u[0, 4, 0]))
    assert abs(np.mean(vals) - 2.0 * 1.0) < 1e-3   # u · offset
    assert abs(np.max(vals) - 2.0 * 1.5) < 1e-3    # u · (offset+amp)
    assert abs(np.min(vals) - 2.0 * 0.5) < 1e-3    # u · (offset−amp)


def test_ramp_inlet_full_trajectory():
    cfg = InletConfig.time_ramp(u=1.0, v=0.0, t_start=0.1, t_end=0.5,
                                value_start=0.0, value_end=2.0)
    u0 = jnp.zeros((1, 9, 8))
    v0 = jnp.zeros_like(u0)
    for t, want in ((0.0, 0.0), (0.1, 0.0), (0.3, 1.0), (0.5, 2.0),
                    (0.9, 2.0)):
        u, _ = apply_inlet(u0, v0, cfg, time=t, dt=1e-3)
        assert abs(float(u[0, 4, 0]) - want) < 1e-6, t


def test_time_modulated_inlet_inside_scan():
    """Modulated inlets must be jax-traceable in t so they can live inside a
    lax.scan step loop (the TPU replacement for the reference's per-step
    host callback)."""
    cfg = InletConfig.uniform(1.0, 0.0).with_time_sinusoidal(
        frequency=1.0, amplitude=1.0, phase=0.0, offset=0.0)
    u0 = jnp.zeros((1, 9, 8))
    v0 = jnp.zeros_like(u0)
    dt = 0.01

    @jax.jit
    def run(u, v):
        def body(carry, i):
            u, v = carry
            t = i * dt
            u, v = apply_inlet(u, v, cfg, time=t, dt=dt)
            return (u, v), u[0, 4, 0]
        (_, _), trace = jax.lax.scan(body, (u, v), jnp.arange(100))
        return trace

    trace = np.asarray(run(u0, v0))
    want = np.sin(2.0 * np.pi * np.arange(100) * dt)
    np.testing.assert_allclose(trace, want, atol=1e-5)


# ---------------------------------------------------------------------------
# 3D z-face inlets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("edge,k", [(Edge.BACK, 0), (Edge.FRONT, -1)])
def test_zface_inlet_uniform(edge, k):
    """Z-face inlets set the whole boundary plane; the profile is evaluated
    at position 0.5 (`boundary_conditions_inlet_scalar.c:32-73`)."""
    u0, v0, w0 = fields3d()
    cfg = InletConfig.uniform(1.2, -0.4).with_edge(edge)
    u, v, w = apply_inlet(u0, v0, cfg, w=w0)
    np.testing.assert_allclose(np.asarray(u)[k], 1.2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v)[k], -0.4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w)[k], 0.0, atol=1e-12)
    # other z planes untouched
    other = 1 if k == 0 else -2
    np.testing.assert_allclose(np.asarray(u)[other], 0.5, atol=1e-12)


@pytest.mark.parametrize("edge,sign", [(Edge.BACK, 1.0), (Edge.FRONT, -1.0)])
def test_zface_inlet_mass_flow_sets_w(edge, sign):
    """Mass-flow z-face inlets drive w INTO the domain: +w from BACK (k=0),
    −w from FRONT (k=nz−1)."""
    u0, v0, w0 = fields3d(val=0.0)
    cfg = InletConfig.mass_flow(mass_flow_rate=2.0, density=1.0,
                                inlet_length=0.5, edge=edge)
    u, v, w = apply_inlet(u0, v0, cfg, w=w0)
    k = 0 if edge == Edge.BACK else -1
    np.testing.assert_allclose(np.asarray(w)[k], sign * 4.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u)[k], 0.0, atol=1e-12)


def test_zface_inlet_time_modulated():
    cfg = InletConfig.uniform(1.0, 0.0, edge=Edge.BACK).with_time_sinusoidal(
        frequency=1.0, amplitude=1.0, phase=0.0, offset=0.5)
    u0, v0, w0 = fields3d(val=0.0)
    u, v, w = apply_inlet(u0, v0, cfg, w=w0, time=0.25, dt=1e-3)
    # modulator at t=0.25: 0.5 + sin(π/2) = 1.5
    np.testing.assert_allclose(np.asarray(u)[0], 1.5, atol=1e-5)


def test_zface_inlet_requires_3d():
    from cfd_tpu.core.status import CFDError
    u0 = jnp.zeros((1, 8, 8))
    v0 = jnp.zeros_like(u0)
    cfg = InletConfig.uniform(1.0, 0.0, edge=Edge.FRONT)
    with pytest.raises(CFDError):
        apply_inlet(u0, v0, cfg)


# ---------------------------------------------------------------------------
# Convective outlet physics
# ---------------------------------------------------------------------------


def upwind_advect(f, c):
    """Interior update of df/dt = −U df/dx with first-order upwind, CFL c."""
    return f.at[:, :, 1:].set(f[:, :, 1:] - c * (f[:, :, 1:] - f[:, :, :-1]))


def test_convective_outlet_transports_pulse_out():
    """A Gaussian pulse advected toward the outlet must leave the domain:
    the boundary trace reproduces the delayed pulse and no residue remains.

    This is the physics the convective condition du/dt + U du/dn = 0
    implements (`boundary_conditions.h:75-78`); the reference's default
    zero-gradient variant holds the boundary at the last interior value.
    """
    nx, ny = 64, 4
    U, dx, dt = 1.0, 1.0 / nx, 0.5 / nx     # CFL 0.5
    c = U * dt / dx
    x = np.arange(nx) * dx
    pulse = np.exp(-((x - 0.3) / 0.05) ** 2)
    f = jnp.asarray(np.broadcast_to(pulse, (1, ny, nx)).copy())
    cfg = OutletConfig.convective(U, edge=Edge.RIGHT, true_convective=True)

    trace = []
    steps = int(2.0 / dt / U)   # enough time to fully exit
    for _ in range(steps):
        f = upwind_advect(f, c)
        f = apply_outlet_scalar(f, cfg, dt=dt, dn=dx)
        trace.append(float(f[0, 1, -1]))
    trace = np.asarray(trace)

    # pulse peak reaches the boundary at t ≈ (1.0 − 0.3)/U
    t_peak = (np.argmax(trace) + 1) * dt
    assert abs(t_peak - 0.7) < 0.1
    assert trace.max() > 0.4          # upwind diffuses but the peak arrives
    # after exit: no reflection / residue anywhere
    assert float(jnp.max(jnp.abs(f))) < 2e-2


def test_convective_outlet_relaxation_rate():
    """With a frozen interior, the discrete update contracts the boundary
    toward the interior value at exactly (1 − U·dt/dn) per step."""
    f = jnp.zeros((1, 4, 8)).at[:, :, -1].set(1.0)
    cfg = OutletConfig.convective(0.5, edge=Edge.RIGHT, true_convective=True)
    dt, dn = 0.1, 0.25
    r = 1.0 - 0.5 * dt / dn
    val = 1.0
    for _ in range(5):
        f = apply_outlet_scalar(f, cfg, dt=dt, dn=dn)
        val *= r
        np.testing.assert_allclose(float(f[0, 2, -1]), val, rtol=1e-6)


def test_zero_gradient_outlet_both_types_z_face():
    """Both outlet types default to zero-gradient (reference parity,
    `boundary_conditions_outlet_scalar.c:33-37`), including z faces."""
    f = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6, 8)))
    for typ in (OutletConfig.zero_gradient(edge=Edge.FRONT),
                OutletConfig.convective(1.0, edge=Edge.FRONT)):
        out = apply_outlet_scalar(f, typ)
        np.testing.assert_allclose(np.asarray(out)[-1], np.asarray(f)[-2])


def test_convective_outlet_needs_dt_dn_else_zero_gradient():
    """true_convective without dt/dn falls back to zero-gradient (the
    reference applies zero-gradient when no time context is available)."""
    f = jnp.zeros((1, 4, 8)).at[:, :, -1].set(1.0).at[:, :, -2].set(0.3)
    cfg = OutletConfig.convective(0.5, edge=Edge.RIGHT, true_convective=True)
    out = apply_outlet_scalar(f, cfg)
    np.testing.assert_allclose(float(out[0, 2, -1]), 0.3, rtol=1e-12)
