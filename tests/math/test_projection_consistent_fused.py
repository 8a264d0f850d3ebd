"""Fused consistent-scheme (stretched-grid) projection — interpret-mode
consistency vs the jnp consistent step.

The mega kernels swap per-point nonuniform weight pins
(`ops/pallas/stretch.stretch_pins_consistent` / `stretch_pins_grad`) for
the uniform compiled constants, and the generalized eigenbasis
(`solvers/poisson/nonuniform.make_nonuniform_fused_pieces`) for the DST
sine matrices; these tests pin the fused paths to the jnp
``nonuniform_scheme="consistent"`` semantics (exact 3-point operators +
FV-symmetrized / generalized-eigenbasis pressure solves) on tanh-stretched
x/y grids — the configuration where the framework beats reference accuracy
(`examples/poiseuille_stretched_grid.c:255-258`) now at kernel speed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.ops.pallas.projection_kernels import ProjectionKernels
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method

NZ, NY, NX = 8, 16, 128


def _grid(axes="xy", beta=1.5):
    return Grid.stretched(NX, NY, NZ, zmin=0.0, zmax=1.0, beta=beta,
                          stretch_axes=axes)


def _field(grid, seed=0, amp=0.1):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    return f.replace(
        u=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32))


def _pair(grid, params, method, **kwargs):
    ref = jax.jit(make_projection_step(grid, params, dtype=jnp.float32,
                                       poisson_method=method,
                                       use_pallas=False, **kwargs))
    fus = jax.jit(make_projection_step(grid, params, dtype=jnp.float32,
                                       poisson_method=method,
                                       use_pallas=True,
                                       pallas_interpret=True, **kwargs))
    return ref, fus


def _assert_step_close(ref, fus, f, atol, names=("u", "v", "w", "p")):
    fr, rr = ref(f, 0.001, 0)
    ff, rf = fus(f, 0.001, 0)
    assert int(rf.status) == int(rr.status) == 0
    for name in names:
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=atol, err_msg=name)
    for attr in ("max_velocity", "max_pressure"):
        np.testing.assert_allclose(float(getattr(rf, attr)),
                                   float(getattr(rr, attr)), rtol=1e-5,
                                   atol=atol, err_msg=attr)
    return ff, fr


def test_consistent_kernels_mega_only():
    g = _grid()
    from cfd_tpu.solvers.poisson.nonuniform import (
        NonuniformPoissonProblem, nonuniform_face_coeffs)
    prob = NonuniformPoissonProblem.from_grid(g)
    pk = ProjectionKernels(
        g.nz, g.ny, g.nx, g.dx0, g.dy0, g.dz0, g.xmin, g.ymin,
        interpret=True, emit="rhs",
        stretch_consistent=(g.dx, g.dy, g.x, g.y),
        face_coeffs=nonuniform_face_coeffs(prob))
    assert pk.mega_ok and not pk.ok  # per-component kernels not built
    with pytest.raises(ValueError):  # y-sharded pins stay unsupported
        ProjectionKernels(g.nz, g.ny, g.nx, g.dx0, g.dy0, g.dz0,
                          g.xmin, g.ymin, interpret=True, global_ny=32,
                          stretch_consistent=(g.dx, g.dy, g.x, g.y),
                          face_coeffs=(1.0, 1.0, 1.0, 1.0))
    with pytest.raises(ValueError):  # btilde needs the face coefficients
        ProjectionKernels(g.nz, g.ny, g.nx, g.dx0, g.dy0, g.dz0,
                          g.xmin, g.ymin, interpret=True, emit="btilde",
                          stretch_consistent=(g.dx, g.dy, g.x, g.y))


@pytest.mark.parametrize("method", [Method.FFT_DIRECT, Method.CG])
@pytest.mark.parametrize("sources", [False, True])
def test_consistent_fused_matches_jnp(method, sources):
    g = _grid()
    amp = 0.5 if sources else 0.0
    params = NSParams(nonuniform_scheme="consistent",
                      source_amplitude_u=amp, source_amplitude_v=amp / 2)
    ref, fus = _pair(g, params, method)
    f = _field(g, seed=3 if sources else 4)
    _assert_step_close(ref, fus, f, atol=5e-5)


def test_consistent_fused_multi_step():
    g = _grid(beta=2.0)
    params = NSParams(nonuniform_scheme="consistent")
    ref, fus = _pair(g, params, Method.FFT_DIRECT)
    fr = ff = _field(g, seed=7)
    for i in range(3):
        fr, rr = ref(fr, 0.001, i)
        ff, rf = fus(ff, 0.001, i)
        assert int(rf.status) == int(rr.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-4, err_msg=name)


def test_consistent_fused_x_only_stretch():
    g = _grid(axes="x")
    params = NSParams(nonuniform_scheme="consistent")
    ref, fus = _pair(g, params, Method.FFT_DIRECT)
    _assert_step_close(ref, fus, _field(g, seed=11), atol=5e-5)


def test_consistent_fused_buoyant_energy():
    g = _grid()
    from cfd_tpu.boundary.types import BCType, ThermalBCConfig
    nm = BCType.NEUMANN
    params = NSParams(nonuniform_scheme="consistent", alpha=1e-3,
                      beta=0.01, T_ref=300.0, gravity=(0.0, -9.81, 0.0),
                      thermal_bc=ThermalBCConfig(left=nm, right=nm,
                                                 bottom=nm, top=nm,
                                                 front=nm, back=nm))
    rng = np.random.default_rng(5)
    f = _field(g, seed=5).replace(
        T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape), jnp.float32))
    ref, fus = _pair(g, params, Method.FFT_DIRECT)
    _assert_step_close(ref, fus, f, atol=5e-5, names=("u", "v", "w", "p",
                                                      "T"))


def test_consistent_fused_high_precision():
    """spectral_precision=HIGH rides the eigenbasis-fused kernels too —
    close to the HIGHEST result but not identical (bf16x3 dots)."""
    g = _grid()
    params = NSParams(nonuniform_scheme="consistent")
    hi = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                      poisson_method=Method.FFT_DIRECT,
                                      use_pallas=True,
                                      pallas_interpret=True))
    lo = jax.jit(make_projection_step(g, params, dtype=jnp.float32,
                                      poisson_method=Method.FFT_DIRECT,
                                      use_pallas=True,
                                      pallas_interpret=True,
                                      spectral_precision=jax.lax.Precision.HIGH))
    f = _field(g, seed=9)
    fh, rh = hi(f, 0.001, 0)
    fl, rl = lo(f, 0.001, 0)
    assert int(rh.status) == int(rl.status) == 0
    np.testing.assert_allclose(np.asarray(fl.p), np.asarray(fh.p),
                               atol=5e-3)
