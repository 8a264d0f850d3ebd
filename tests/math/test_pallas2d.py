"""2D fused projection kernels (block-marching engine) — interpret-mode
consistency vs the jnp step, mirroring the reference's cross-backend
strategy (`tests/validation/test_cavity_backends.c:38-50`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.ops.pallas.marching2d import (make_marching_stencil_2d,
                                           marching2d_supported,
                                           pick_block_rows)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method


def _random_field(grid, seed=0, amp=0.2):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    return f.replace(
        u=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32))


def test_pick_block_rows():
    assert pick_block_rows(32, 128, 1, 2, 2) == 8
    b = pick_block_rows(2048, 2048, 3, 1, 4)
    assert b is not None and b % 8 == 0 and 2048 % b == 0
    assert pick_block_rows(30, 128, 1, 1, 1) is None    # ny % 8
    assert pick_block_rows(64, 100, 1, 1, 1) is None    # nx % 128
    assert not marching2d_supported(16, 128, 1, 1, 1)   # < 4 blocks


def test_marching_engine_identity_and_halo():
    """A y-shift stencil through the engine equals the jnp equivalent,
    including across block boundaries."""
    ny, nx = 64, 128
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 1, (ny, nx)), jnp.float32)

    def compute(row0, scalars, halos, planes):
        pm, pc, pp = halos[0]
        B = pc.shape[0]
        pe = jnp.concatenate([pm[-1:], pc, pp[:1]], axis=0)
        jg = row0 + jax.lax.broadcasted_iota(jnp.int32, (B, nx), 0)
        ok = (jg > 0) & (jg < ny - 1)
        val = pe[2:] - pe[:-2]
        return [jnp.where(ok, val, pc)]

    fn = make_marching_stencil_2d(ny, nx, 1, 0, 1, compute,
                                  interpret=True)
    (out,) = fn(jnp.zeros(1), a)
    ref = np.asarray(a)
    exp = ref.copy()
    exp[1:-1] = ref[2:] - ref[:-2]
    np.testing.assert_allclose(np.asarray(out), exp, atol=1e-6)


@pytest.mark.parametrize("method", [Method.FFT_DIRECT, Method.CG])
@pytest.mark.parametrize("sources", [True, False])
def test_fused2d_matches_jnp(method, sources):
    g = Grid.uniform(128, 32)
    amp = 1.0 if sources else 0.0
    params = NSParams(source_amplitude_u=amp, source_amplitude_v=amp)
    f = _random_field(g)

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
                                   atol=1e-5)


def test_fused2d_shell_passthrough_and_clamp():
    """Caller-set boundary values survive the step (save/restore idiom) and
    interior velocities are clamped at ±100."""
    g = Grid.uniform(128, 32)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = _random_field(g, seed=4)
    u = f.u.at[0, 0, :].set(7.0).at[0, -1, :].set(-3.0)
    u = u.at[0, :, 0].set(2.5).at[0, :, -1].set(1.5)
    # corner ownership: rows win where both wrote
    u = u.at[0, 0, 0].set(7.0).at[0, -1, -1].set(-3.0)
    f = f.replace(u=u, v=f.v * 4000.0)  # huge v -> interior clamps engage

    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    ff, _ = fus(f, 0.01, 0)
    np.testing.assert_array_equal(np.asarray(ff.u[0, 0, 1:-1]), 7.0)
    np.testing.assert_array_equal(np.asarray(ff.u[0, -1, 1:-1]), -3.0)
    np.testing.assert_array_equal(np.asarray(ff.u[0, 1:-1, 0]), 2.5)
    np.testing.assert_array_equal(np.asarray(ff.u[0, 1:-1, -1]), 1.5)
    assert float(jnp.max(jnp.abs(ff.v[0, 1:-1, 1:-1]))) <= 100.0


def test_fused2d_multi_step_and_energy():
    g = Grid.uniform(128, 32)
    params = NSParams(alpha=0.02)
    f = _random_field(g, seed=9)
    f = f.replace(T=jnp.full(g.shape, 300.0, jnp.float32)
                  .at[0, 5:10, 20:40].set(310.0))

    ref = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT))
    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    fr, ff = f, f
    for i in range(3):
        fr, _ = ref(fr, 0.001, i)
        ff, rf = fus(ff, 0.001, i)
    assert int(rf.status) == 0
    np.testing.assert_allclose(np.asarray(ff.u), np.asarray(fr.u), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ff.T), np.asarray(fr.T), atol=1e-4)


def test_spectral_precision_knob():
    """HIGH-precision spectral solve stays close to HIGHEST."""
    from jax import lax
    g = Grid.uniform(128, 32)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = _random_field(g, seed=5)
    hi = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                      poisson_method=Method.FFT_DIRECT))
    lo = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                      poisson_method=Method.FFT_DIRECT,
                                      spectral_precision=lax.Precision.HIGH))
    fh, _ = hi(f, 0.001, 0)
    fl, _ = lo(f, 0.001, 0)
    np.testing.assert_allclose(np.asarray(fl.p), np.asarray(fh.p),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fl.u), np.asarray(fh.u),
                               atol=1e-5)


def test_fused2d_buoyant_matches_jnp():
    """Boussinesq fused into the 2D predictor (T as a 4th halo input)
    matches the jnp projection step with natural-convection parameters."""
    import jax
    import numpy as np

    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.uniform(128, 64)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    rng = np.random.default_rng(7)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
                  T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
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
    for name in ("u", "v", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=2e-5, err_msg=name)


def test_dst2d_fused_matches_jnp(monkeypatch):
    """The DST-fused 2D family (r5: in-kernel x-DST in the predictor,
    inverse-DST-on-arrival + physical-p output in the corrector, TDMA-y
    line solve between) engages at nx % 1024 shapes and matches the jnp
    step."""
    import cfd_tpu.solvers.poisson.spectral as spectral_mod

    calls = []
    orig = spectral_mod.make_dst2d_fused_pieces

    def spy(*a, **k):
        calls.append(k)
        return orig(*a, **k)

    monkeypatch.setattr(spectral_mod, "make_dst2d_fused_pieces", spy)

    g = Grid.uniform(1024, 32)
    params = NSParams()
    f = _random_field(g, seed=17)
    ref = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT))
    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    assert len(calls) == 1      # the DST-fused family was selected
    fr, rr = ref(f, 0.001, 0)
    ff, rf = fus(f, 0.001, 0)
    assert int(rf.status) == int(rr.status) == 0
    for name in ("u", "v", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)


def test_dst2d_fused_multi_step_buoyant():
    """Three buoyant steps through the DST-fused 2D family track the jnp
    integrator (T rides the predictor; p comes back physical with its
    mirror shells from the corrector's arrival transform)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.uniform(1024, 32)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    rng = np.random.default_rng(41)
    f = _random_field(g, seed=19)
    f = f.replace(T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))
    ref = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT))
    fus = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                       poisson_method=Method.FFT_DIRECT,
                                       use_pallas=True,
                                       pallas_interpret=True))
    # dt well under the convective limit for the 1/1023 spacing — at
    # dt=1e-3 the random-noise field amplifies toward the ±100 clamps
    # and the chaotic trajectory magnifies benign f32 transform
    # differences into percent-level field divergence
    fr, ff = f, f
    for i in range(3):
        fr, _ = ref(fr, 1e-4, i)
        ff, rf = fus(ff, 1e-4, i)
    assert int(rf.status) == 0
    for name in ("u", "v", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   rtol=1e-5, atol=5e-5, err_msg=name)
    # p carries the buoyant solve's larger dynamic range (|p| ~ 25 with
    # rod = ρ/dt = 1e4 amplifying the b̃ intermediates): compare at a
    # field-scale-relative bound (measured fused-vs-jnp ≈ 7e-4 ≈ 3e-5·|p|)
    p_scale = float(np.abs(np.asarray(fr.p)).max())
    np.testing.assert_allclose(np.asarray(ff.p), np.asarray(fr.p),
                               atol=1e-4 * p_scale, err_msg="p")
