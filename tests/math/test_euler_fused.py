"""Fused single-pass Euler kernel — interpret-mode consistency vs the jnp
step: fields, boundary dance (periodic wrap + velocity shell restore),
clamps, rho guards, diagnostics, and divergence detection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step

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


def _steps(params):
    g = _grid()
    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fus = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=True, pallas_interpret=True))
    return ref, fus


@pytest.mark.parametrize("sources", [True, False])
def test_fused_euler_matches_jnp(sources):
    amp = 0.1 if sources else 0.0
    params = NSParams(source_amplitude_u=amp, source_amplitude_v=amp / 2)
    ref, fus = _steps(params)
    f = _field(seed=1)
    fr, rr = ref(f, 5e-5, 3)     # iter_idx 3: decay factor exercised
    ff, rf = fus(f, 5e-5, 3)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-6, err_msg=name)
    for attr in ("max_velocity", "max_pressure", "max_temperature"):
        np.testing.assert_allclose(float(getattr(rf, attr)),
                                   float(getattr(rr, attr)), rtol=1e-6,
                                   err_msg=attr)


def test_fused_euler_multi_step():
    params = NSParams()
    ref, fus = _steps(params)
    fr = ff = _field(seed=2)
    for i in range(4):
        fr, _ = ref(fr, 1e-4, i)
        ff, rf = fus(ff, 1e-4, i)
    assert int(rf.status) == 0
    for name in ("u", "v", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


def test_fused_euler_clamps_and_rho_guard():
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    ref, fus = _steps(params)
    f = _field(seed=3)
    # huge pressure gradient engages derivative/update clamps; a rho hole
    # engages the per-point guard
    f = f.replace(p=f.p * 1e6,
                  rho=f.rho.at[4, 8, 64].set(1e-12))
    fr, rr = ref(f, 1e-4, 0)
    ff, rf = fus(f, 1e-4, 0)
    assert int(rr.status) == int(rf.status)
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-6, err_msg=name)
    # the guarded point kept its old velocity in both paths
    np.testing.assert_allclose(float(ff.u[4, 8, 64]), float(f.u[4, 8, 64]))


@pytest.mark.nan_injection
def test_fused_euler_divergence_detection():
    params = NSParams()
    _, fus = _steps(params)
    for where in ((0, 5, 5), (4, 5, 5)):    # shell plane and interior
        f = _field(seed=4)
        f = f.replace(u=f.u.at[where].set(jnp.nan))
        _, rf = fus(f, 1e-4, 0)
        assert int(rf.status) == -6, where


def test_fused_euler_gating():
    """Unsupported configs (2D, custom callables) silently keep the jnp
    step."""
    g2 = Grid.uniform(64, 64)                       # 2D
    s = make_euler_step(g2, NSParams(), dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True)
    f2 = FlowField.initialize(g2, dtype=jnp.float32)
    out, res = jax.jit(s)(f2, 1e-4, 0)
    assert int(res.status) == 0

    custom = NSParams(source_func=lambda X, Y, Z, t: (X, Y, 0.0))
    s3 = make_euler_step(_grid(), custom, dtype=jnp.float32,
                         use_pallas=True, pallas_interpret=True)
    out3, res3 = jax.jit(s3)(_field(seed=5), 1e-4, 0)
    assert int(res3.status) == 0


def test_fused_euler_energy_and_buoyancy_matches_jnp():
    """Natural-convection configuration: fused energy advection-diffusion,
    Boussinesq sources, and mixed thermal faces agree with the jnp step."""
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
    ref, fus = _steps(params)
    fr = ff = _field(seed=7, amp=0.1)
    for i in range(3):
        fr, rr = ref(fr, 1e-4, i)
        ff, rf = fus(ff, 1e-4, i)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-5, err_msg=name)
    np.testing.assert_allclose(float(rf.max_temperature),
                               float(rr.max_temperature), rtol=1e-6)


def test_fused_euler_all_periodic_thermal():
    """Default thermal config (all PERIODIC) with energy on."""
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=2e-3)
    ref, fus = _steps(params)
    f = _field(seed=8, amp=0.1)
    fr, rr = ref(f, 1e-4, 0)
    ff, rf = fus(f, 1e-4, 0)
    assert int(rr.status) == int(rf.status) == 0
    np.testing.assert_allclose(np.asarray(ff.T), np.asarray(fr.T),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ff.u), np.asarray(fr.u),
                               atol=2e-6)
