"""Mega-fused 3D projection kernels (±2-window predictor+btilde, corrector
with fused max-reduction diagnostics) — interpret-mode consistency vs the
jnp step, including StepResult diagnostic parity (the reductions must match
``field_status_and_diagnostics`` exactly, shells included)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.ops.pallas.projection_kernels import ProjectionKernels
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method


def _random_field(grid, seed=0, amp=0.1):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    return f.replace(
        u=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32))


def test_mega_kernels_built():
    g = Grid.uniform(128, 16, 8, zmin=0.0, zmax=1.0)
    pk = ProjectionKernels(g.nz, g.ny, g.nx, g.dx0, g.dy0, g.dz0,
                           g.xmin, g.ymin, interpret=True)
    assert pk.mega_ok
    # z-sharded mode builds the mega kernels too (r5: the DST-fused
    # sharded path rides them) alongside the per-component fallbacks
    pk_sh = ProjectionKernels(4, 16, 128, g.dx0, g.dy0, g.dz0,
                              g.xmin, g.ymin, interpret=True, global_nz=16)
    assert pk_sh.mega_ok and pk_sh.ok


@pytest.mark.parametrize("method", [Method.FFT_DIRECT, Method.CG])
@pytest.mark.parametrize("nz,sources", [(8, True), (16, False)])
def test_mega_matches_jnp(method, nz, sources):
    g = Grid.uniform(128, 16, nz, zmin=0.0, zmax=1.0)
    amp = 1.0 if sources else 0.0
    params = NSParams(source_amplitude_u=amp, source_amplitude_v=amp)
    f = _random_field(g, seed=nz)

    ref = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=method))
    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=method,
                                       use_pallas=True,
                                       pallas_interpret=True))
    fr, rr = ref(f, 0.001, 0)
    ff, rf = fus(f, 0.001, 0)
    assert int(rf.status) == int(rr.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-5)
    # fused diagnostics parity: interior reductions + shell face maxima
    # must reproduce the jnp full-field reductions
    for attr in ("max_velocity", "max_pressure", "max_temperature"):
        np.testing.assert_allclose(float(getattr(rf, attr)),
                                   float(getattr(rr, attr)), rtol=1e-6,
                                   err_msg=attr)


def test_mega_diag_catches_shell_extremum():
    """A velocity extremum sitting ON the z-shell must be reported (the
    kernel reductions skip shell planes; the step folds in face maxima)."""
    g = Grid.uniform(128, 16, 8, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = _random_field(g, seed=3)
    f = f.replace(u=f.u.at[0].set(9.0))  # z=0 shell plane dominates

    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    ff, rf = fus(f, 0.001, 0)
    assert float(rf.max_velocity) >= 9.0


@pytest.mark.nan_injection
def test_mega_divergence_detection():
    """NaN injection is still caught through the fused max-reductions."""
    g = Grid.uniform(128, 16, 8, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    for where in ((0, 5, 5), (4, 5, 5)):  # shell plane and interior
        f = _random_field(g, seed=4)
        f = f.replace(u=f.u.at[where].set(jnp.nan))
        ff, rf = fus(f, 0.001, 0)
        assert int(rf.status) == -6, where  # DIVERGED


def test_mega_dst_high_precision(monkeypatch):
    """``spectral_precision=HIGH`` rides the DST-fused mega path (the r4
    gate rejected HIGH and silently fell back to the slower emit-b̃ kernel
    family) and stays close to the HIGHEST step."""
    from jax import lax

    import cfd_tpu.solvers.poisson.spectral as spectral_mod

    calls = []
    orig = spectral_mod.make_dst_fused_pieces

    def spy(*a, **k):
        calls.append(k)
        return orig(*a, **k)

    monkeypatch.setattr(spectral_mod, "make_dst_fused_pieces", spy)

    g = Grid.uniform(128, 16, 8, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = _random_field(g, seed=11)
    hi = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                      poisson_method=Method.FFT_DIRECT,
                                      use_pallas=True,
                                      pallas_interpret=True))
    lo = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                      poisson_method=Method.FFT_DIRECT,
                                      use_pallas=True,
                                      pallas_interpret=True,
                                      spectral_precision=lax.Precision.HIGH))
    assert len(calls) >= 2  # both steps built DST-fused pieces
    fh, _ = hi(f, 0.001, 0)
    fl, rl = lo(f, 0.001, 0)
    assert int(rl.status) == 0
    np.testing.assert_allclose(np.asarray(fl.p), np.asarray(fh.p),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fl.u), np.asarray(fh.u),
                               atol=1e-4)


def test_mega_buoyant_matches_jnp():
    """Boussinesq buoyancy fused into the predictor sweep (T rides as a
    4th halo window in the mega kernel) matches the jnp projection step
    with the same natural-convection parameters."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.uniform(128, 16, 8, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.05), thermal_bc=thermal)
    rng = np.random.default_rng(23)
    f = _random_field(g, seed=5)
    f = f.replace(T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT))
    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    fr, rr = ref(f, 0.001, 0)
    ff, rf = fus(f, 0.001, 0)
    assert int(rf.status) == int(rr.status) == 0
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-5, err_msg=name)


@pytest.mark.parametrize("stretched", [False, True],
                         ids=["uniform", "consistent_stretched"])
def test_reverse_march_corrector_matches_three_pass(monkeypatch, stretched):
    """The reverse-march corrector (Thomas backward substitution riding
    the corrector sweep as an engine carry — the whole spectral step is
    TWO marching kernels) must be bit-identical to the three-pass family
    (predictor → standalone backward TDMA → corrector), diagnostics
    included, and must actually engage.  On-chip the two are bit-identical
    too (TPUVAL r5 `projection_dst_bwdfused`)."""
    from cfd_tpu.ops.pallas import projection_kernels as pk_mod

    if stretched:
        g = Grid.stretched(128, 16, 8, zmin=0.0, zmax=1.0, beta=1.5,
                           stretch_axes="xy")
        params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.02,
                          nonuniform_scheme="consistent")
    else:
        g = Grid.uniform(128, 16, 12, zmin=0.0, zmax=1.0)
        params = NSParams(source_amplitude_u=0.5, source_amplitude_v=0.25)
    f = _random_field(g, seed=31)

    # old family: corr_bwd forced off → standalone bwd TDMA between sweeps
    orig_init = pk_mod.ProjectionKernels.__init__

    def no_bwd_init(self, *a, **k):
        orig_init(self, *a, **k)
        self.corr_bwd = None

    monkeypatch.setattr(pk_mod.ProjectionKernels, "__init__", no_bwd_init)
    old = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    monkeypatch.setattr(pk_mod.ProjectionKernels, "__init__", orig_init)

    engaged = []
    orig_bwd = pk_mod.ProjectionKernels.corrector_bwd_diag

    def spy(self, *a, **k):
        engaged.append(True)
        return orig_bwd(self, *a, **k)

    monkeypatch.setattr(pk_mod.ProjectionKernels, "corrector_bwd_diag", spy)
    new = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))

    fo, ro = old(f, 0.001, 0)
    fn, rn = new(f, 0.001, 0)
    assert engaged, "reverse-march corrector did not engage"
    assert int(rn.status) == int(ro.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_array_equal(np.asarray(getattr(fn, name)),
                                      np.asarray(getattr(fo, name)),
                                      err_msg=name)
    for attr in ("max_velocity", "max_pressure"):
        assert float(getattr(rn, attr)) == float(getattr(ro, attr)), attr
