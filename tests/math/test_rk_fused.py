"""Fused RK2/RK4 stage kernels — interpret-mode consistency vs the jnp
step: stage chaining, periodic-interior wrap (incl. the pinned z-wrap
planes), clamps, diagnostics, divergence detection, gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step

NZ, NY, NX = 8, 16, 128


def _grid():
    return Grid.uniform(NX, NY, NZ, zmin=0.0, zmax=1.0)


def _field(seed=0, amp=0.3):
    g = _grid()
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(g, dtype=jnp.float32)
    return f.replace(
        u=jnp.asarray(rng.normal(0, amp, g.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, g.shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, amp, g.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, g.shape), jnp.float32),
        T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape), jnp.float32))


@pytest.mark.parametrize("maker", [make_rk2_step, make_rk4_step])
@pytest.mark.parametrize(
    "sources", [True, pytest.param(False, marks=pytest.mark.heavy)])
def test_fused_rk_matches_jnp(maker, sources):
    amp = 0.1 if sources else 0.0
    params = NSParams(source_amplitude_u=amp, source_amplitude_v=amp / 2)
    g = _grid()
    ref = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=False))
    fus = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True))
    f = _field(seed=1)
    fr, rr = ref(f, 5e-5, 2)
    ff, rf = fus(f, 5e-5, 2)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)
    for attr in ("max_velocity", "max_pressure", "max_temperature"):
        np.testing.assert_allclose(float(getattr(rf, attr)),
                                   float(getattr(rr, attr)), rtol=1e-6,
                                   err_msg=attr)


@pytest.mark.heavy
def test_fused_rk4_multi_step():
    params = NSParams()
    g = _grid()
    ref = jax.jit(make_rk4_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fus = jax.jit(make_rk4_step(g, params, dtype=jnp.float32,
                                use_pallas=True, pallas_interpret=True))
    fr = ff = _field(seed=2)
    for i in range(3):
        fr, _ = ref(fr, 1e-4, i)
        ff, rf = fus(ff, 1e-4, i)
    assert int(rf.status) == 0
    for name in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-5, err_msg=name)


@pytest.mark.heavy
@pytest.mark.nan_injection
def test_fused_rk_divergence_detection():
    g = _grid()
    fus = jax.jit(make_rk2_step(g, NSParams(), dtype=jnp.float32,
                                use_pallas=True, pallas_interpret=True))
    f = _field(seed=3)
    f = f.replace(u=f.u.at[4, 5, 5].set(jnp.nan))
    _, rf = fus(f, 1e-4, 0)
    assert int(rf.status) == -6


@pytest.mark.heavy
def test_fused_rk_gating_falls_back():
    """2D and custom-callable configs keep the jnp step silently."""
    g2 = Grid.uniform(64, 64)
    s = make_rk2_step(g2, NSParams(), dtype=jnp.float32, use_pallas=True,
                      pallas_interpret=True)
    f2 = FlowField.initialize(g2, dtype=jnp.float32)
    _, res = jax.jit(s)(f2, 1e-4, 0)
    assert int(res.status) == 0

    custom = NSParams(source_func=lambda X, Y, Z, t: (X, Y, 0.0))
    s3 = make_rk4_step(_grid(), custom, dtype=jnp.float32,
                       use_pallas=True, pallas_interpret=True)
    _, res3 = jax.jit(s3)(_field(seed=4), 1e-4, 0)
    assert int(res3.status) == 0


@pytest.mark.heavy
def test_fused_rk_energy_and_buoyancy_matches_jnp():
    """Buoyant stages + final-stage fused energy/thermal BCs agree with
    the jnp RK4 step (the natural-convection configuration)."""
    from cfd_tpu.boundary.types import BCType, DirichletValues, \
        ThermalBCConfig

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        back=BCType.NEUMANN, front=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0,
                                         front=300.0))
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    g = _grid()
    ref = jax.jit(make_rk4_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fus = jax.jit(make_rk4_step(g, params, dtype=jnp.float32,
                                use_pallas=True, pallas_interpret=True))
    f = _field(seed=6, amp=0.1)
    fr, rr = ref(f, 1e-4, 0)
    ff, rf = fus(f, 1e-4, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-5, err_msg=name)
