"""Sharded consistency for the remaining solver surface: RK2/RK4, the
energy equation + Boussinesq coupling, and iterative Poisson presets under
GSPMD — rounding out `test_sharding.py`'s euler/projection/fft coverage.

Strategy per SURVEY.md §4: bit-comparable (fp-tolerance) sharded-vs-single-
device runs on the 8-virtual-device CPU mesh.
"""

import jax
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.parallel import make_mesh, make_sharded_step
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step
from cfd_tpu.solvers.energy import make_energy_step
from cfd_tpu.solvers.ns.projection import make_projection_step


def assert_fields_close(a: FlowField, b: FlowField, rtol=1e-12, atol=1e-12):
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.parametrize("method,maker", [("rk2", make_rk2_step),
                                          ("rk4", make_rk4_step)])
def test_sharded_rk_2d_matches_single_device(method, maker):
    g = Grid.uniform(32, 32)
    params = NSParams()
    f = FlowField.initialize(g)
    ref_step = jax.jit(maker(g, params))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    mesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, mesh, method)
    f_out, res_out = step(place(f), 0.001, 0)
    assert_fields_close(f_out, f_ref)
    assert int(res_out.status) == int(res_ref.status) == 0


@pytest.mark.parametrize("method,maker", [("rk2", make_rk2_step),
                                          ("rk4", make_rk4_step)])
def test_sharded_rk_3d_mesh2d(method, maker):
    """RK stages use periodic-interior stencils (no inter-stage BCs) — the
    GSPMD halo collectives must compose across all stages."""
    g = Grid.uniform(16, 16, 16, zmin=0, zmax=1)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = FlowField.initialize(g)
    ref_step = jax.jit(maker(g, params))
    f_ref, _ = ref_step(f, 0.001, 0)

    mesh = make_mesh(axes=("z", "y"))
    step, place = make_sharded_step(g, params, mesh, method)
    f_out, res = step(place(f), 0.001, 0)
    assert int(res.status) == 0
    assert_fields_close(f_out, f_ref, rtol=1e-10, atol=1e-10)
    assert len(f_out.u.sharding.device_set) == 8


def test_sharded_rk_multi_step():
    g = Grid.uniform(16, 32)
    params = NSParams()
    f = FlowField.initialize(g)
    mesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, mesh, "rk4")
    fs = place(f)
    fr = f
    ref_step = jax.jit(make_rk4_step(g, params))
    for i in range(3):
        fs, _ = step(fs, 0.001, i)
        fr, _ = ref_step(fr, 0.001, i)
    assert bool(fs.is_finite())
    assert_fields_close(fs, fr)


def test_sharded_energy_step_matches_single_device():
    """Standalone energy advection-diffusion under GSPMD (the T stencil
    halos shard like the momentum ones)."""
    g = Grid.uniform(24, 24)
    energy = make_energy_step(g, alpha=1e-3)
    f = FlowField.initialize(g)
    # seed a temperature gradient so advection/diffusion are nontrivial
    import jax.numpy as jnp
    yy = jnp.linspace(0.0, 1.0, 24)
    T0 = 300.0 + 10.0 * jnp.sin(jnp.pi * yy)[None, :, None]
    f = f.replace(T=jnp.broadcast_to(T0, f.T.shape))

    T_ref = jax.jit(energy)(f.T, f.u, f.v, f.w, 1e-3, 0.0)

    mesh = make_mesh(axes=("y",))
    from cfd_tpu.parallel.mesh import field_sharding
    sh = field_sharding(mesh, is_3d=False)
    place = lambda a: jax.device_put(a, sh)
    T_sh = jax.jit(energy, out_shardings=sh)(
        place(f.T), place(f.u), place(f.v), place(f.w), 1e-3, 0.0)
    np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_ref),
                               rtol=1e-12, atol=1e-12)
    assert len(T_sh.sharding.device_set) == 8


def test_sharded_boussinesq_projection_matches_single_device():
    """Full natural-convection coupling (energy + buoyancy inside the
    projection step) sharded over (z, y) — the de Vahl Davis configuration
    at reduced scale (`test_natural_convection.c` analog)."""
    from cfd_tpu.solvers.ns.params import ThermalBCConfig

    g = Grid.uniform(16, 16, 8, zmin=0.0, zmax=0.5)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.1, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0),
                      thermal_bc=ThermalBCConfig())
    import jax.numpy as jnp
    f = FlowField.initialize(g)
    xx = jnp.linspace(0.0, 1.0, 16)
    T0 = 300.0 + 5.0 * xx[None, None, :]
    f = f.replace(T=jnp.broadcast_to(T0, f.T.shape))

    ref_step = jax.jit(make_projection_step(g, params))
    f_ref, _ = ref_step(f, 1e-3, 0)
    assert float(jnp.max(jnp.abs(f_ref.v))) > 0.0  # buoyancy actually acts

    mesh = make_mesh(axes=("z", "y"))
    step, place = make_sharded_step(g, params, mesh, "projection")
    f_out, res = step(place(f), 1e-3, 0)
    assert int(res.status) == 0
    assert_fields_close(f_out, f_ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("pmethod", ["REDBLACK_SOR", "BICGSTAB"])
def test_sharded_projection_iterative_poisson(pmethod):
    """The reference's default preset (Red-Black) and BiCGSTAB under GSPMD:
    two-color masked sweeps / Krylov dot-product psums shard correctly."""
    from cfd_tpu.solvers.poisson.base import Method, PoissonParams

    g = Grid.uniform(16, 16)
    params = NSParams()
    pp = PoissonParams(tolerance=1e-6, max_iterations=4000)
    f = FlowField.initialize(g)
    ref_step = jax.jit(make_projection_step(
        g, params, poisson_method=Method[pmethod], poisson_params=pp))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    mesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, mesh, "projection",
                                    poisson_method=Method[pmethod],
                                    poisson_params=pp)
    f_out, res = step(place(f), 0.001, 0)
    # Stationary methods converge to the mirrored-Neumann fixed point, so a
    # tight tolerance may legitimately report max-iter (reference's
    # "BC-limited" behavior); the sharded run must agree with single-device
    # bit-for-bit on status, residual, and fields.
    assert int(res.status) == int(res_ref.status)
    # Krylov dot-products psum in a different reduction order under GSPMD,
    # so allow fp-reassociation drift on the residual scalar.
    np.testing.assert_allclose(float(res.residual), float(res_ref.residual),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(f_out.u), np.asarray(f_ref.u),
                               rtol=1e-10, atol=1e-10)
