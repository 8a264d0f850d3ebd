"""Fused multi-chip projection path (shard_map + ring halos + pencil DST).

Validates the performance half of the domain decomposition on the 8-device
virtual CPU mesh: numerics vs the single-device jnp and single-chip fused
paths, the presence of the designed collectives in the compiled HLO, and
the use_pallas guard/fallback in ``make_sharded_step``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.parallel import make_mesh, make_sharded_step
from cfd_tpu.parallel.fused import (fused_sharded_unsupported_reason,
                                    make_fused_sharded_projection_step)
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


@pytest.fixture(scope="module")
def grid():
    return Grid.uniform(128, 16, 16, zmin=0.0, zmax=1.0)


@pytest.fixture(scope="module")
def zmesh():
    return make_mesh(axes=("z",))


def test_fused_sharded_matches_jnp_single_device(grid, zmesh):
    params = NSParams()
    f = _random_field(grid)

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(grid, params, zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32)
    f_out, res = step(place(f), 0.001, 0)

    assert int(res.status) == int(res_ref.status) == 0
    assert len(f_out.u.sharding.device_set) == 8
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=5e-6)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=5e-5)


@pytest.mark.heavy
def test_fused_sharded_matches_fused_single_chip(grid, zmesh):
    """Same kernels, sharded vs one device: agreement at f32 roundoff."""
    params = NSParams()
    f = _random_field(grid, seed=3)

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32, use_pallas=True,
        pallas_interpret=True, poisson_method=Method.FFT_DIRECT))
    f_ref, _ = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(grid, params, zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32)
    f_out, _ = step(place(f), 0.001, 0)

    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=2e-6)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=2e-5)


def test_fused_sharded_hlo_collectives(grid, zmesh):
    """The compiled program contains the designed ICI collectives: ring
    halo exchanges (collective-permute) and pencil transposes (all-to-all),
    and no all-gather of a full field."""
    params = NSParams()
    step = make_fused_sharded_projection_step(grid, params, zmesh)
    f = _random_field(grid)
    from cfd_tpu.parallel.mesh import shard_field
    fs = shard_field(f, zmesh)
    hlo = jax.jit(step).lower(fs, jnp.float32(1e-3), 0).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-to-all" in hlo


def test_fused_sharded_multi_step(grid, zmesh):
    """Three steps track the single-device jnp integrator."""
    params = NSParams()
    f = _random_field(grid, seed=7)

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    step, place = make_sharded_step(grid, params, zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(3):
        fr, _ = ref_step(fr, 0.001, i)
        fs, res = step(fs, 0.001, i)
    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(fs.u), np.asarray(fr.u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p), atol=2e-4)


def test_fused_sharded_energy_coupling(grid, zmesh):
    """Energy advection-diffusion runs sharded (GSPMD) after the fused
    momentum step and matches the single-device solution."""
    params = NSParams(alpha=0.05)
    f = _random_field(grid, seed=11)
    T0 = jnp.asarray(
        np.random.default_rng(5).normal(300.0, 1.0, grid.shape), jnp.float32)
    f = f.replace(T=T0)

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    f_ref, _ = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(grid, params, zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32)
    f_out, res = step(place(f), 0.001, 0)
    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(f_out.T), np.asarray(f_ref.T),
                               rtol=1e-5, atol=1e-4)


def test_use_pallas_guard_fallback(grid):
    """use_pallas on a non-qualifying mesh falls back to the GSPMD jnp path
    (never runs the manual-DMA kernels under GSPMD) and stays correct."""
    params = NSParams()
    f = _random_field(grid, seed=2)
    # (z, y) meshes are supported, but ny=16 over 4 y-shards leaves 4
    # rows per shard (< 8, breaks sublane alignment) → must fall back.
    mesh2d = make_mesh(axes=("z", "y"))
    assert fused_sharded_unsupported_reason(
        grid, params, mesh2d, jnp.float32) is not None

    step, place = make_sharded_step(grid, params, mesh2d, "projection",
                                    use_pallas=True, dtype=jnp.float32,
                                    poisson_method=Method.FFT_DIRECT)
    f_out, res = step(place(f), 0.001, 0)
    assert int(res.status) == 0

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    f_ref, _ = ref_step(f, 0.001, 0)
    np.testing.assert_allclose(np.asarray(f_out.u), np.asarray(f_ref.u),
                               atol=1e-5)


def test_unsupported_reasons(grid):
    params = NSParams()
    zmesh = make_mesh(axes=("z",))
    # wrong dtype
    assert "float32" in fused_sharded_unsupported_reason(
        grid, params, zmesh, jnp.float64)
    # 2D grid
    g2 = Grid.uniform(128, 16)
    assert fused_sharded_unsupported_reason(
        g2, params, zmesh, jnp.float32) is not None
    # indivisible nz
    g_odd = Grid.uniform(128, 16, 12, zmin=0.0, zmax=1.0)
    assert "divisible" in fused_sharded_unsupported_reason(
        g_odd, params, zmesh, jnp.float32)
    # custom source
    p_src = NSParams(source_func=lambda X, Y, Z, t: (X, Y, Z))
    assert "jnp path" in fused_sharded_unsupported_reason(
        grid, p_src, zmesh, jnp.float32)


def test_fused_sharded_euler_matches_jnp_single_device():
    """Fused shard_map Euler over a z mesh (ring-halo ppermutes + cross-
    shard periodic wrap) matches the single-device jnp step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.euler import make_euler_step

    g = Grid.uniform(128, 16, 24, zmin=0.0, zmax=1.0)
    params = NSParams()
    rng = np.random.default_rng(11)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fr, rr = ref(f, 1e-4, 2)

    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, dtype=jnp.float32)
    ff, rf = step(place(f), 1e-4, 2)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)
    assert len(ff.u.sharding.device_set) == 8


def test_fused_sharded_euler_multi_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.euler import make_euler_step

    g = Grid.uniform(128, 8, 24, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = FlowField.initialize(g, dtype=jnp.float32)
    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(3):
        fr, _ = ref(fr, 1e-4, i)
        fs, rs = step(fs, 1e-4, i)
    assert int(rs.status) == 0
    np.testing.assert_allclose(np.asarray(fs.u), np.asarray(fr.u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=1e-5)


def test_fused_sharded_rk4_matches_jnp_single_device():
    """Fused shard_map RK4: per-stage ring halos, cross-shard periodic-
    interior pins (global z-offset), and final periodic shells match the
    single-device jnp step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.rk import make_rk4_step

    g = Grid.uniform(128, 16, 24, zmin=0.0, zmax=1.0)
    params = NSParams()
    rng = np.random.default_rng(13)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))

    ref = jax.jit(make_rk4_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fr, rr = ref(f, 1e-4, 1)

    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "rk4",
                                    use_pallas=True, dtype=jnp.float32)
    ff, rf = step(place(f), 1e-4, 1)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)
    assert len(ff.u.sharding.device_set) == 8


def test_fused_sharded_euler_convection_matches_jnp():
    """Energy + Boussinesq + mixed thermal faces through the fused sharded
    Euler: thermal z-shells resolve per face type (Neumann local to the
    edge shard, Dirichlet constant, periodic cross-shard)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.euler import make_euler_step

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        back=BCType.NEUMANN, front=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0,
                                         front=300.0))
    g = Grid.uniform(128, 16, 24, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    rng = np.random.default_rng(17)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
                  T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fr, rr = ref(f, 1e-4, 0)

    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, dtype=jnp.float32)
    ff, rf = step(place(f), 1e-4, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


def test_fused_sharded_projection_convection_matches_jnp(grid, zmesh):
    """Natural-convection configuration (energy + Boussinesq + mixed
    thermal faces) through the fused sharded projection: buoyant predictor
    kernels (T rides as an extra plane input), pencil DST, GSPMD energy
    step — matches the single-device jnp step (the de Vahl Davis coupling,
    `energy_solver.h:43-87` called from `solver_projection.c:256-268`)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.05), thermal_bc=thermal)
    rng = np.random.default_rng(29)
    f = _random_field(grid, seed=19)
    f = f.replace(T=jnp.asarray(300.0 + rng.normal(0, 1.0, grid.shape),
                                jnp.float32))

    from cfd_tpu.parallel.fused import fused_sharded_unsupported_reason
    assert fused_sharded_unsupported_reason(
        grid, params, zmesh, jnp.float32) is None

    ref_step = jax.jit(make_projection_step(
        grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    f_ref, rr = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(grid, params, zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32)
    f_out, rf = step(place(f), 0.001, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "T"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=5e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=5e-5)


def test_fused_sharded_rk4_convection_matches_jnp():
    """Energy + Boussinesq + thermal faces through the fused sharded RK4:
    buoyancy in every stage's sources, T advected by the final velocities,
    thermal z-shells resolved per face type across shards."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.parallel.fused import fused_sharded_rk_unsupported_reason
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.rk import make_rk4_step

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        back=BCType.NEUMANN, front=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0,
                                         front=300.0))
    g = Grid.uniform(128, 16, 24, zmin=0.0, zmax=1.0)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    mesh = make_mesh(axes=("z",))
    assert fused_sharded_rk_unsupported_reason(
        g, params, mesh, jnp.float32) is None

    rng = np.random.default_rng(31)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
                  T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref = jax.jit(make_rk4_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fr, rr = ref(f, 1e-4, 0)

    step, place = make_sharded_step(g, params, mesh, "rk4",
                                    use_pallas=True, dtype=jnp.float32)
    ff, rf = step(place(f), 1e-4, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


def test_strict_fallback_raises(grid):
    """use_pallas + strict=True surfaces the disqualifying reason instead
    of silently running the 15x-slower GSPMD jnp path.  (Every integrator
    now accepts (z, y) meshes, so disqualify on the local y block being
    too thin for the zy kernels: ny=16 over 4 y-shards -> 4 rows/shard.)"""
    params = NSParams()
    mesh2d = make_mesh(axes=("z", "y"))
    with pytest.raises(ValueError, match="y-shards"):
        make_sharded_step(grid, params, mesh2d, "rk2",
                          use_pallas=True, strict=True, dtype=jnp.float32)
    # ny=16 over 4 y-shards -> 4 rows/shard < 8: zy projection refuses too.
    with pytest.raises(ValueError, match="y-shards"):
        make_sharded_step(grid, params, mesh2d, "projection",
                          use_pallas=True, strict=True, dtype=jnp.float32)


def test_fused_sharded_2d_matches_jnp_single_device():
    """2D fused shard_map projection (y-decomposition feeding the
    block-marching kernels in global-row mode + 1D-pencil distributed DST)
    matches the single-device jnp step.  The reference's published perf
    configs are 2D (`README.md:225-231`)."""
    g = Grid.uniform(128, 256)
    params = NSParams()
    rng = np.random.default_rng(41)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32))

    from cfd_tpu.parallel.fused import fused_sharded_unsupported_reason
    ymesh = make_mesh(axes=("y",))
    assert fused_sharded_unsupported_reason(
        g, params, ymesh, jnp.float32) is None

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))
    fr, rr = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(g, params, ymesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fs, rf = step(place(f), 0.001, 0)
    assert int(rr.status) == int(rf.status) == 0
    assert len(fs.u.sharding.device_set) == 8
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=5e-5)


def test_fused_sharded_2d_multi_step_with_sources():
    """Three steps with the default decaying sources track the jnp step
    (global-row source coordinates across shards)."""
    g = Grid.uniform(128, 192)
    params = NSParams(source_amplitude_u=1.0, source_amplitude_v=0.5)
    f = FlowField.initialize(g, dtype=jnp.float32)
    ymesh = make_mesh(axes=("y",))

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))
    step, place = make_sharded_step(g, params, ymesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(3):
        fr, _ = ref_step(fr, 0.001, i)
        fs, rs = step(fs, 0.001, i)
    assert int(rs.status) == 0
    np.testing.assert_allclose(np.asarray(fs.u), np.asarray(fr.u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=2e-4)


def test_fused_sharded_2d_dst_fused_matches_jnp():
    """y-sharded DST-fused 2D projection (r5): in-kernel x DSTs in the
    global-row marching kernels, transform-space halo rings, and the
    per-slab y-eigen solve around two x-mode-pencil all_to_alls as the
    only cross-shard stage — matches the single-device jnp step.  Also
    pins gate selection and the spectral_precision=HIGH knob."""
    import cfd_tpu.solvers.poisson.spectral as spectral_mod
    from cfd_tpu.solvers.poisson.base import PoissonProblem

    g = Grid.uniform(1024, 192)            # nx%1024, ny/8 shards = 24 rows
    prob = PoissonProblem(g.nx, g.ny, 1, g.dx0, g.dy0, 0.0)
    assert spectral_mod.dst2d_fused_sharded_supported(prob, 8)
    # nx=128 keeps the pencil fallback (x mode dim != nx)
    small = PoissonProblem(128, 192, 1, prob.dx, prob.dy, 0.0)
    assert not spectral_mod.dst2d_fused_sharded_supported(small, 8)

    params = NSParams()
    rng = np.random.default_rng(43)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32))

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))
    fr, rr = ref_step(f, 0.001, 0)

    ymesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, ymesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fs, rf = step(place(f), 0.001, 0)
    assert int(rr.status) == int(rf.status) == 0
    assert len(fs.u.sharding.device_set) == 8
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=5e-5)

    # HIGH: per-shard in-kernel bf16_3x transforms — bf16_3x-class
    # agreement, and a different answer than HIGHEST (knob reached them)
    steph, _ = make_sharded_step(g, params, ymesh, "projection",
                                 use_pallas=True, strict=True,
                                 dtype=jnp.float32,
                                 spectral_precision=lax.Precision.HIGH)
    fh, rh = steph(place(f), 0.001, 0)
    assert int(rh.status) == 0
    pscale = float(jnp.max(jnp.abs(fr.p)))
    # bf16_3x-class: looser than 3D's ~2e-5 — the 2D solve's lowest
    # eigenvalues amplify the transform's bf16 rounding by 1/λmin more
    # at this grid's aspect ratio (measured 8e-4 here)
    assert float(jnp.max(jnp.abs(fh.p - fr.p))) / pscale < 3e-3
    assert float(jnp.max(jnp.abs(fh.p - fs.p))) > 0.0


def test_fused_sharded_2d_unsupported_reasons():
    from cfd_tpu.parallel.fused import fused_sharded_unsupported_reason

    params = NSParams()
    ymesh = make_mesh(axes=("y",))
    # too few rows per shard
    g_small = Grid.uniform(128, 64)
    assert "24 rows" in fused_sharded_unsupported_reason(
        g_small, params, ymesh, jnp.float32)
    # 2D on a z-mesh
    g2 = Grid.uniform(128, 256)
    zmesh2 = make_mesh(axes=("z",))
    assert "y-only mesh" in fused_sharded_unsupported_reason(
        g2, params, zmesh2, jnp.float32)
    # buoyancy is supported in 2D (T rides as a 4th halo input)
    pb = NSParams(beta=0.1, gravity=(0.0, -9.81, 0.0))
    assert fused_sharded_unsupported_reason(
        g2, pb, ymesh, jnp.float32) is None


def test_fused_sharded_2d_convection_matches_jnp():
    """2D natural-convection configuration (the de Vahl Davis geometry)
    through the fused sharded 2D projection: buoyant predictor kernels
    (T as a 4th halo input), GSPMD energy step, thermal faces."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.uniform(128, 256)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    rng = np.random.default_rng(43)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
                  T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))
    fr, rr = ref_step(f, 0.001, 0)

    ymesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, ymesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fs, rf = step(place(f), 0.001, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=5e-5)


@pytest.mark.heavy
def test_fused_sharded_2d_dst_convection_matches_jnp():
    """Buoyancy + energy through the y-sharded DST-fused 2D path (r5):
    the buoyant predictor (T as a 4th halo input) emits the x-transformed
    b̃ in-kernel; transform-space halos and the slab y-eigen solve carry
    the rest.  Two steps so p cycles through the transform path."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.uniform(1024, 192)            # DST-fused sharded shape
    # alpha*dt/dx^2 must stay << 1/4 at dx ~ 1e-3 (explicit diffusion
    # limit) or T amplifies rounding differences into test noise
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-5, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    rng = np.random.default_rng(47)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
                  T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))
    ymesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, ymesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(2):
        fr, rr = ref_step(fr, 1e-4, i)
        fs, rf = step(fs, 1e-4, i)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=1e-3)


def test_fused_sharded_euler_stretched_matches_jnp():
    """Stretched x/y grid through the fused sharded Euler path: the per-
    point coefficient pins are shard-invariant under z-decomposition, so
    the sharded kernel must match the single-device jnp per-point-spacing
    step (`solvers/ns/common.spacing_arrays`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.euler import make_euler_step

    g = Grid.stretched(128, 16, 24, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.02)
    rng = np.random.default_rng(21)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fr, rr = ref(f, 5e-5, 1)

    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 5e-5, 1)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)
    assert len(ff.u.sharding.device_set) == 8


@pytest.mark.heavy
def test_fused_sharded_rk2_stretched_matches_jnp():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.rk import make_rk2_step

    g = Grid.stretched(128, 16, 24, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.02)
    rng = np.random.default_rng(22)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))

    ref = jax.jit(make_rk2_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fr, rr = ref(f, 5e-5, 1)

    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "rk2",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 5e-5, 1)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


def test_fused_sharded_stretched_energy_reason():
    """Stretched x/y + energy equation must NOT engage the fused sharded
    path (energy requires uniform grids); strict=False falls back, and the
    reason names the conflict."""
    import jax.numpy as jnp

    from cfd_tpu import Grid
    from cfd_tpu.parallel import make_mesh
    from cfd_tpu.parallel.fused import (
        fused_sharded_euler_unsupported_reason,
        fused_sharded_rk_unsupported_reason)
    from cfd_tpu.solvers.ns import NSParams

    g = Grid.stretched(128, 16, 24, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = NSParams(alpha=1e-3)
    mesh = make_mesh(axes=("z",))
    for fn in (fused_sharded_euler_unsupported_reason,
               fused_sharded_rk_unsupported_reason):
        reason = fn(g, params, mesh, jnp.float32)
        assert reason is not None and "stretched" in reason


def test_fused_sharded_euler_consistent_scheme_matches_jnp():
    """nonuniform_scheme='consistent' through the fused sharded Euler path
    (the 7 weight pins replicate per shard like the parity pins)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu import FlowField, Grid
    from cfd_tpu.parallel import make_mesh, make_sharded_step
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.euler import make_euler_step

    g = Grid.stretched(128, 16, 24, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.02,
                      nonuniform_scheme="consistent")
    rng = np.random.default_rng(31)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
                  p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fr, rr = ref(f, 5e-5, 1)

    mesh = make_mesh(axes=("z",))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 5e-5, 1)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=5e-6, err_msg=name)


# ---------------------------------------------------------------------------
# (z, y) 2D-mesh decomposition — the pod-scale fused projection
# ---------------------------------------------------------------------------

def _zy_grid():
    # nzl = 8/2 = 4 planes, nyl = 32/4 = 8 rows on a (2, 4) mesh
    return Grid.uniform(128, 32, 8, zmin=0.0, zmax=1.0)


def _zy_mesh(pz, py):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:pz * py]).reshape(pz, py),
                ("z", "y"))


def test_fused_sharded_zy_pencil_exact():
    """Two-axis pencil DST (4 all_to_alls) is exact vs the single-device
    pipeline, in f64, across mesh aspect ratios incl. degenerate axes."""
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.spectral import (
        _make_btilde_pipeline, make_btilde_pipeline_sharded_zy)

    nz, ny, nx = 8, 16, 10
    prob = PoissonProblem(nx=nx, ny=ny, nz=nz, dx=0.1, dy=0.1, dz=0.1)
    rng = np.random.default_rng(7)
    b = np.zeros((nz, ny, nx))
    b[1:-1, 1:-1, 1:-1] = rng.normal(size=(nz - 2, ny - 2, nx - 2))
    b = jnp.asarray(b)
    ref = _make_btilde_pipeline(prob, lax.Precision.HIGHEST)(b)

    for pz, py in ((2, 4), (4, 2), (8, 1), (1, 8), (2, 2)):
        mesh = _zy_mesh(pz, py)
        pipe = make_btilde_pipeline_sharded_zy(prob, pz, py,
                                               dtype=jnp.float64)
        f = jax.jit(jax.shard_map(pipe, mesh=mesh,
                                  in_specs=P("z", "y", None),
                                  out_specs=P("z", "y", None),
                                  check_vma=False))
        np.testing.assert_allclose(np.asarray(f(b)), np.asarray(ref),
                                   atol=1e-12,
                                   err_msg=f"mesh ({pz},{py})")


def test_fused_sharded_zy_matches_jnp_single_device():
    """3D fused projection over a (2, 4) (z, y) mesh — global-row-mode
    kernels + two-stage (y then z) ring halos + two-axis pencil DST —
    matches the single-device jnp step."""
    g = _zy_grid()
    params = NSParams()
    f = _random_field(g, seed=41)
    mesh = _zy_mesh(2, 4)
    assert fused_sharded_unsupported_reason(
        g, params, mesh, jnp.float32) is None

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))
    f_ref, rr = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(g, params, mesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    f_out, rf = step(place(f), 0.001, 0)
    assert int(rr.status) == int(rf.status) == 0
    assert len(f_out.u.sharding.device_set) == 8
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=5e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=5e-5)


def test_fused_sharded_zy_cg_builds():
    """The fused sharded CG pressure solve covers (z, y) meshes too —
    the zy projection accepts poisson_method=CG (exact-match coverage in
    tests/parallel/test_fused_cg_sharded.py)."""
    g = _zy_grid()
    mesh = _zy_mesh(2, 4)
    step = make_fused_sharded_projection_step(
        g, NSParams(), mesh, poisson_method=Method.CG, interpret=True)
    assert step is not None


def test_fused_sharded_zy_dst_selected(monkeypatch):
    """The (z, y)-mesh DST-fused mega branch is picked at qualifying
    shapes (r5: in-kernel x transforms + four-all_to_all y/z solve), and
    the gate rejects shapes the x-mode all_to_all can't split."""
    import cfd_tpu.solvers.poisson.spectral as spectral_mod
    from cfd_tpu.solvers.poisson.base import PoissonProblem

    g = _zy_grid()
    prob = PoissonProblem(g.nx, g.ny, g.nz, g.dx0, g.dy0, g.dz0)
    assert spectral_mod.dst_fused_sharded_zy_supported(prob, 2, 4)
    # nx=128 % 3 != 0: the x-mode all_to_all over Pz=3 can't split
    assert not spectral_mod.dst_fused_sharded_zy_supported(
        PoissonProblem(128, 32, 6, prob.dx, prob.dy, prob.dz), 3, 2)
    # nyl=4 < 8: the 4-row halo pad would break sublane alignment
    assert not spectral_mod.dst_fused_sharded_zy_supported(
        PoissonProblem(128, 16, 8, prob.dx, prob.dy, prob.dz), 2, 4)

    calls = []
    orig = spectral_mod.make_dst_fused_sharded_zy_pieces

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(spectral_mod, "make_dst_fused_sharded_zy_pieces",
                        spy)
    make_fused_sharded_projection_step(g, NSParams(), _zy_mesh(2, 4),
                                       interpret=True)
    assert len(calls) == 1


def test_fused_sharded_zy_yzsolve_exact():
    """The x-prefused y/z solve stage (`make_dst_fused_sharded_zy_pieces`)
    composed with its own (FxT, GxT) x transforms equals the single-device
    pipeline in f64, across mesh aspect ratios incl. a degenerate z axis."""
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.spectral import (
        _make_btilde_pipeline, make_dst_fused_sharded_zy_pieces)

    nz, ny, nx = 8, 32, 128
    prob = PoissonProblem(nx=nx, ny=ny, nz=nz, dx=0.05, dy=0.1, dz=0.1)
    rng = np.random.default_rng(3)
    b = np.zeros((nz, ny, nx))
    b[1:-1, 1:-1, 1:-1] = rng.normal(size=(nz - 2, ny - 2, nx - 2))
    b = jnp.asarray(b, jnp.float64)
    ref = _make_btilde_pipeline(prob, lax.Precision.HIGHEST)(b)

    for pz, py in ((2, 4), (4, 2), (2, 2), (1, 2)):
        mats_x, yz = make_dst_fused_sharded_zy_pieces(
            prob, pz, py, dtype=jnp.float64)
        FxT, GxT = mats_x

        def full(bl):
            bt_x = jnp.einsum("zyx,xa->zya", bl,
                              jnp.asarray(FxT, bl.dtype),
                              precision=lax.Precision.HIGHEST)
            xh = yz(bt_x)
            return jnp.einsum("zyx,xa->zya", xh,
                              jnp.asarray(GxT, xh.dtype),
                              precision=lax.Precision.HIGHEST)

        f = jax.jit(jax.shard_map(full, mesh=_zy_mesh(pz, py),
                                  in_specs=P("z", "y", None),
                                  out_specs=P("z", "y", None),
                                  check_vma=False))
        np.testing.assert_allclose(np.asarray(f(b)), np.asarray(ref),
                                   atol=1e-11,
                                   err_msg=f"mesh ({pz},{py})")


def test_fused_sharded_zy_dst_high_precision():
    """``spectral_precision=HIGH`` rides the zy-mesh DST-fused path: the
    in-kernel x transforms run the 3-pass bf16 split and the knob
    actually changes the answer (i.e. it reached the kernels)."""
    g = _zy_grid()
    params = NSParams()
    f = _random_field(g, seed=41)
    mesh = _zy_mesh(2, 4)

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))
    f_ref, _ = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(g, params, mesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32,
                                    spectral_precision=lax.Precision.HIGH)
    f_out, res = step(place(f), 0.001, 0)
    assert int(res.status) == 0
    pscale = float(jnp.max(jnp.abs(f_ref.p)))
    assert float(jnp.max(jnp.abs(f_out.p - f_ref.p))) / pscale < 2e-4
    step_hi, _ = make_sharded_step(g, params, mesh, "projection",
                                   use_pallas=True, strict=True,
                                   dtype=jnp.float32)
    f_hi, _ = step_hi(place(f), 0.001, 0)
    assert float(jnp.max(jnp.abs(f_hi.p - f_out.p))) > 0.0


@pytest.mark.heavy
def test_fused_sharded_zy_convection_multi_step():
    """Energy + Boussinesq + sinusoidal sources through the zy-mesh fused
    projection over several steps, across mesh aspect ratios — matches the
    single-device jnp trajectory (the de Vahl Davis coupling on the 2D
    device mesh)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    g = Grid.uniform(128, 64, 8, zmin=0.0, zmax=1.0)
    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    params = NSParams(alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.05), thermal_bc=thermal)
    rng = np.random.default_rng(43)
    f = _random_field(g, seed=43)
    f = f.replace(T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, poisson_method=Method.FFT_DIRECT))

    def roll(step, place, f, n=3):
        f = place(f)
        for i in range(n):
            f, res = step(f, 1e-3, i)
            assert int(res.status) == 0
        return f

    f_ref = roll(ref_step, lambda x: x, f)
    for pz, py in ((2, 4), (1, 8), (4, 2)):
        mesh = _zy_mesh(pz, py)
        step, place = make_sharded_step(g, params, mesh, "projection",
                                        use_pallas=True, strict=True,
                                        dtype=jnp.float32)
        f_out = roll(step, place, f)
        for name in ("u", "v", "w", "T"):
            np.testing.assert_allclose(
                np.asarray(getattr(f_out, name)),
                np.asarray(getattr(f_ref, name)), atol=1e-5,
                err_msg=f"{name} mesh ({pz},{py})")
        np.testing.assert_allclose(np.asarray(f_out.p),
                                   np.asarray(f_ref.p), atol=1e-4,
                                   err_msg=f"p mesh ({pz},{py})")


def test_fused_sharded_zy_euler_matches_jnp_single_device():
    """Fused Euler over a (2, 4) (z, y) mesh — global-row-mode single-pass
    kernel + two-stage (y then z) ring halos + post-kernel x→y→z boundary
    dance — matches the single-device jnp step, default sources on."""
    from cfd_tpu.solvers.ns.euler import make_euler_step

    g = _zy_grid()
    params = NSParams()
    f = _random_field(g, seed=47)
    mesh = _zy_mesh(2, 4)

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fr, rr = ref(f, 1e-4, 2)

    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 1e-4, 2)
    assert int(rr.status) == int(rf.status) == 0
    assert len(ff.u.sharding.device_set) == 8
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


@pytest.mark.heavy
def test_fused_sharded_zy_euler_convection_multi_step():
    """Energy + Boussinesq + mixed thermal faces through the zy-mesh fused
    Euler over several steps, across mesh aspect ratios: thermal y faces
    resolve per type post-kernel (Neumann local to the edge shard,
    Dirichlet constant, periodic cross-shard), z faces own the corners."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.solvers.ns.euler import make_euler_step

    g = Grid.uniform(128, 32, 16, zmin=0.0, zmax=1.0)
    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.DIRICHLET,
        back=BCType.NEUMANN, front=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0,
                                         top=298.0, front=300.0))
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.05), thermal_bc=thermal)
    rng = np.random.default_rng(53)
    f = _random_field(g, seed=53)
    f = f.replace(T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))

    def roll(step, place, f, n=3):
        f = place(f)
        for i in range(n):
            f, res = step(f, 1e-4, i)
            assert int(res.status) == 0
        return f

    f_ref = roll(ref, lambda x: x, f)
    for pz, py in ((2, 4), (4, 2), (2, 2)):
        mesh = _zy_mesh(pz, py)
        step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                        use_pallas=True, strict=True,
                                        dtype=jnp.float32)
        f_out = roll(step, place, f)
        for name in ("u", "v", "w", "p", "T"):
            np.testing.assert_allclose(
                np.asarray(getattr(f_out, name)),
                np.asarray(getattr(f_ref, name)), atol=1e-5,
                err_msg=f"{name} mesh ({pz},{py})")


def test_fused_sharded_zy_rk2_matches_jnp_single_device():
    """Fused RK2 over a (2, 4) (z, y) mesh — global-row stage kernels
    whose periodic-interior y substitutions resolve against the PERIODIC
    4-row y-halo ring — matches the single-device jnp step."""
    from cfd_tpu.solvers.ns.rk import make_rk2_step

    g = Grid.uniform(128, 32, 8, zmin=0.0, zmax=1.0)
    params = NSParams()
    f = _random_field(g, seed=59)
    mesh = _zy_mesh(2, 4)

    ref = jax.jit(make_rk2_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fr, rr = ref(f, 1e-4, 1)

    step, place = make_sharded_step(g, params, mesh, "rk2",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 1e-4, 1)
    assert int(rr.status) == int(rf.status) == 0
    assert len(ff.u.sharding.device_set) == 8
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


@pytest.mark.heavy
def test_fused_sharded_zy_rk4_convection_multi_step():
    """Energy + Boussinesq + mixed thermal faces through the zy-mesh
    fused RK4 over several steps, across mesh aspect ratios."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.solvers.ns.rk import make_rk4_step

    g = Grid.uniform(128, 32, 16, zmin=0.0, zmax=1.0)
    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.DIRICHLET,
        back=BCType.NEUMANN, front=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0,
                                         top=298.0, front=300.0))
    params = NSParams(alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.05), thermal_bc=thermal)
    rng = np.random.default_rng(61)
    f = _random_field(g, seed=61)
    f = f.replace(T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape),
                                jnp.float32))

    ref = jax.jit(make_rk4_step(g, params, dtype=jnp.float32,
                                use_pallas=False))

    def roll(step, place, f, n=3):
        f = place(f)
        for i in range(n):
            f, res = step(f, 1e-4, i)
            assert int(res.status) == 0
        return f

    f_ref = roll(ref, lambda x: x, f)
    for pz, py in ((2, 4), (4, 2), (2, 2)):
        mesh = _zy_mesh(pz, py)
        step, place = make_sharded_step(g, params, mesh, "rk4",
                                        use_pallas=True, strict=True,
                                        dtype=jnp.float32)
        f_out = roll(step, place, f)
        for name in ("u", "v", "w", "p", "T"):
            np.testing.assert_allclose(
                np.asarray(getattr(f_out, name)),
                np.asarray(getattr(f_ref, name)), atol=2e-5,
                err_msg=f"{name} mesh ({pz},{py})")


def test_fused_sharded_2d_euler_matches_jnp_single_device():
    """2D fused shard_map Euler (y-decomposition + single-pass marching
    kernel in global-row mode) matches the single-device jnp step — the
    reference's published perf configs are 2D explicit Euler
    (`README.md:225-231`)."""
    from cfd_tpu.solvers.ns.euler import make_euler_step

    g = Grid.uniform(128, 256)
    params = NSParams()
    rng = np.random.default_rng(67)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32))
    mesh = make_mesh(axes=("y",))

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(3):
        fr, rr = ref(fr, 1e-4, i)
        fs, rf = step(fs, 1e-4, i)
        assert int(rr.status) == int(rf.status) == 0
    assert len(fs.u.sharding.device_set) == 8
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-6, err_msg=name)


def test_fused_sharded_2d_euler_convection():
    """Energy + Boussinesq + mixed thermal faces through the 2D sharded
    fused Euler (thermal y faces resolve per type cross-shard)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.solvers.ns.euler import make_euler_step

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.NEUMANN,
        bottom=BCType.NEUMANN, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, top=295.0))
    g = Grid.uniform(128, 256)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    rng = np.random.default_rng(71)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape), jnp.float32))
    mesh = make_mesh(axes=("y",))

    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fr, rr = ref(f, 1e-4, 0)
    fs, rf = step(place(f), 1e-4, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-6, err_msg=name)


def test_fused_sharded_zy_euler_stretched_matches_jnp():
    """Stretched x/y grids on a (z, y) 2D mesh: the global coefficient
    pin planes are row-sliced per shard (4 edge-replicated halo rows) and
    appended at call time — both schemes match the single-device jnp
    per-point-spacing step."""
    from cfd_tpu.solvers.ns.euler import make_euler_step

    for scheme in ("parity", "consistent"):
        g = Grid.stretched(128, 32, 8, zmin=0.0, zmax=1.0, beta=1.5,
                           stretch_axes="xy")
        params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.02,
                          nonuniform_scheme=scheme)
        rng = np.random.default_rng(23)
        f = FlowField.initialize(g, dtype=jnp.float32)
        f = f.replace(
            u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
            v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
            w=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
            p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))

        ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                      use_pallas=False))
        fr, rr = ref(f, 5e-5, 1)

        step, place = make_sharded_step(g, params, _zy_mesh(2, 4),
                                        "explicit_euler", use_pallas=True,
                                        strict=True, dtype=jnp.float32)
        ff, rf = step(place(f), 5e-5, 1)
        assert int(rr.status) == int(rf.status) == 0
        for name in ("u", "v", "w", "p", "rho", "T"):
            np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                       np.asarray(getattr(fr, name)),
                                       atol=5e-6,
                                       err_msg=f"{name} ({scheme})")


@pytest.mark.heavy
def test_fused_sharded_zy_rk2_stretched_consistent():
    """Consistent-scheme stretched grid + energy through the zy-mesh
    fused RK2 (the coefficient pins ride after the wrap pins)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.solvers.ns.rk import make_rk2_step

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.stretched(128, 32, 8, zmin=0.0, zmax=1.0, beta=1.2,
                       stretch_axes="xy")
    params = NSParams(alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal,
                      nonuniform_scheme="consistent")
    rng = np.random.default_rng(29)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape), jnp.float32))

    ref = jax.jit(make_rk2_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fr, rr = ref(f, 5e-5, 0)

    step, place = make_sharded_step(g, params, _zy_mesh(2, 4), "rk2",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 5e-5, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


@pytest.mark.parametrize("method,maker_name", [("rk2", "make_rk2_step"),
                                               ("rk4", "make_rk4_step")])
def test_fused_sharded_2d_rk_matches_jnp_single_device(method, maker_name):
    """2D fused shard_map RK (y-decomposition + marching stage kernels in
    global-row mode, psum y-wrap pins) matches the single-device jnp
    step — RK wraps velocities too, so every face crosses shards."""
    import cfd_tpu.solvers.ns.rk as rk_mod

    g = Grid.uniform(128, 256)
    params = NSParams()
    f = _random_field(g, seed=73)
    mesh = make_mesh(axes=("y",))

    ref = jax.jit(getattr(rk_mod, maker_name)(g, params, dtype=jnp.float32,
                                              use_pallas=False))
    step, place = make_sharded_step(g, params, mesh, method,
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(3):
        fr, rr = ref(fr, 1e-3, i)
        fs, rf = step(fs, 1e-3, i)
        assert int(rr.status) == int(rf.status) == 0
    assert len(fs.u.sharding.device_set) == 8
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-6, err_msg=name)


def test_fused_sharded_2d_rk_convection():
    """Energy + Boussinesq + mixed thermal faces through the 2D sharded
    fused RK2 (energy fused into the final stage; thermal y faces resolve
    per type cross-shard)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.solvers.ns.rk import make_rk2_step

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.NEUMANN,
        bottom=BCType.NEUMANN, top=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, top=295.0))
    g = Grid.uniform(128, 256)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal)
    rng = np.random.default_rng(79)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape), jnp.float32))
    mesh = make_mesh(axes=("y",))

    ref = jax.jit(make_rk2_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    step, place = make_sharded_step(g, params, mesh, "rk2",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    fr, rr = ref(f, 1e-3, 0)
    fs, rf = step(place(f), 1e-3, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-6, err_msg=name)


def test_fused_sharded_2d_rk_unsupported_reasons():
    """The 2D RK gate reports the disqualifier instead of mis-building."""
    from cfd_tpu.parallel.fused import fused_sharded_rk_unsupported_reason

    mesh = make_mesh(axes=("y",))
    ok = fused_sharded_rk_unsupported_reason(
        Grid.uniform(128, 256), NSParams(), mesh, jnp.float32)
    assert ok is None
    r = fused_sharded_rk_unsupported_reason(
        Grid.uniform(128, 100), NSParams(), mesh, jnp.float32)
    assert r is not None and "divisible" in r
    # stretched x/y is supported now; energy + parity scheme is not
    ok = fused_sharded_rk_unsupported_reason(
        Grid.stretched(128, 256, beta=1.5, stretch_axes="xy"),
        NSParams(), mesh, jnp.float32)
    assert ok is None
    r = fused_sharded_rk_unsupported_reason(
        Grid.stretched(128, 256, beta=1.5, stretch_axes="xy"),
        NSParams(alpha=1e-3), mesh, jnp.float32)
    assert r is not None and "consistent" in r


def test_fused_sharded_2d_euler_stretched_matches_jnp():
    """Stretched x/y grids through the y-decomposed 2D fused Euler: the
    y-weight planes are built globally with 4 edge-replicated halo rows
    and dynamic-sliced per shard; the x-row pin replicates verbatim.
    Both schemes match the single-device jnp per-point-spacing step."""
    from cfd_tpu.solvers.ns.euler import make_euler_step

    mesh = make_mesh(axes=("y",))
    for scheme in ("parity", "consistent"):
        g = Grid.stretched(128, 256, beta=1.5, stretch_axes="xy")
        params = NSParams(source_amplitude_u=0.05,
                          source_amplitude_v=0.02,
                          nonuniform_scheme=scheme)
        rng = np.random.default_rng(83)
        f = FlowField.initialize(g, dtype=jnp.float32)
        f = f.replace(
            u=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
            v=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32),
            p=jnp.asarray(rng.normal(0, 0.2, g.shape), jnp.float32))

        ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                      use_pallas=False))
        fr, rr = ref(f, 5e-5, 1)

        step, place = make_sharded_step(g, params, mesh, "explicit_euler",
                                        use_pallas=True, strict=True,
                                        dtype=jnp.float32)
        ff, rf = step(place(f), 5e-5, 1)
        assert int(rr.status) == int(rf.status) == 0
        for name in ("u", "v", "w", "p", "rho", "T"):
            np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                       np.asarray(getattr(fr, name)),
                                       atol=5e-6,
                                       err_msg=f"{name} ({scheme})")


@pytest.mark.heavy
def test_fused_sharded_2d_rk2_stretched_consistent_energy():
    """Consistent-scheme stretched 2D grid + energy + Boussinesq through
    the y-decomposed fused RK2 (the y-weight planes ride between the acc
    planes and the wrap pins; x-rows after the pins)."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)
    from cfd_tpu.solvers.ns.rk import make_rk2_step

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    g = Grid.stretched(128, 256, beta=1.2, stretch_axes="xy")
    params = NSParams(alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0), thermal_bc=thermal,
                      nonuniform_scheme="consistent")
    rng = np.random.default_rng(89)
    f = FlowField.initialize(g, dtype=jnp.float32)
    f = f.replace(
        u=jnp.asarray(rng.normal(0, 0.1, g.shape), jnp.float32),
        T=jnp.asarray(300.0 + rng.normal(0, 1.0, g.shape), jnp.float32))

    ref = jax.jit(make_rk2_step(g, params, dtype=jnp.float32,
                                use_pallas=False))
    fr, rr = ref(f, 5e-5, 0)

    step, place = make_sharded_step(g, params, make_mesh(axes=("y",)),
                                    "rk2", use_pallas=True, strict=True,
                                    dtype=jnp.float32)
    ff, rf = step(place(f), 5e-5, 0)
    assert int(rr.status) == int(rf.status) == 0
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=1e-5, err_msg=name)


# ---------------------------------------------------------------------------
# DST-fused mega kernels on the z-sharded path (r5): in-kernel xy DSTs per
# shard, y-pencil all_to_all z line solve — matching the single-chip r4
# kernel structure (parity target: the device-resident loop contract,
# solver_projection_gpu.cu:617-772, now under domain decomposition).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dst_grid():
    # ny/8 must stay a multiple of 8 (the y-pencil TDMA slab shape) for
    # the sharded DST-fused path to engage on the 8-device mesh
    return Grid.uniform(128, 64, 16, zmin=0.0, zmax=1.0)


def test_dst_fused_sharded_selected(dst_grid, zmesh, monkeypatch):
    """The DST-fused branch is actually picked at qualifying shapes (and
    the small-ny fixture grid keeps the pencil fallback)."""
    import cfd_tpu.solvers.poisson.spectral as spectral_mod
    from cfd_tpu.solvers.poisson.base import PoissonProblem

    prob = PoissonProblem(dst_grid.nx, dst_grid.ny, dst_grid.nz,
                          dst_grid.dx0, dst_grid.dy0, dst_grid.dz0)
    assert spectral_mod.dst_fused_sharded_supported(prob, 8)
    # ny/P = 2 rows per shard: no y-slab TDMA shape
    small = PoissonProblem(128, 16, 16, prob.dx, prob.dy, prob.dz)
    assert not spectral_mod.dst_fused_sharded_supported(small, 8)

    calls = []
    orig = spectral_mod.make_dst_fused_sharded_pieces

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(spectral_mod, "make_dst_fused_sharded_pieces", spy)
    make_fused_sharded_projection_step(dst_grid, NSParams(), zmesh)
    assert len(calls) == 1


def test_dst_fused_sharded_matches_jnp(dst_grid, zmesh):
    """One step of the sharded DST-fused mega path vs the single-device
    jnp projection step: f32-roundoff agreement."""
    params = NSParams()
    f = _random_field(dst_grid, seed=21)

    ref_step = jax.jit(make_projection_step(
        dst_grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(dst_grid, params, zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32)
    f_out, res = step(place(f), 0.001, 0)
    assert int(res.status) == int(res_ref.status) == 0
    assert len(f_out.u.sharding.device_set) == 8
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=5e-6, err_msg=name)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=5e-5)


def test_dst_fused_sharded_high_precision(dst_grid, zmesh):
    """``spectral_precision=HIGH`` rides the sharded DST-fused path (r5):
    the per-shard in-kernel xy transforms run the 3-pass bf16 split
    (`rolling.hp_dot_general`), mirroring the single-chip knob.  The
    dropped lo·lo term is O(2^-16) relative — assert the bf16_3x-scale
    agreement with the exact (HIGHEST) jnp reference, and that the knob
    actually changes the answer (i.e. it reached the kernels)."""
    params = NSParams()
    f = _random_field(dst_grid, seed=21)

    ref_step = jax.jit(make_projection_step(
        dst_grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(dst_grid, params, zmesh, "projection",
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32,
                                    spectral_precision=lax.Precision.HIGH)
    f_out, res = step(place(f), 0.001, 0)
    assert int(res.status) == int(res_ref.status) == 0
    pscale = float(jnp.max(jnp.abs(f_ref.p)))
    dp = float(jnp.max(jnp.abs(f_out.p - f_ref.p)))
    assert dp / pscale < 2e-4  # bf16_3x class (measured ~2e-5 at 256³)
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=2e-4, err_msg=name)
    # HIGHEST run differs → the precision knob reached the in-kernel dots
    step_hi, _ = make_sharded_step(dst_grid, params, zmesh, "projection",
                                   use_pallas=True, strict=True,
                                   dtype=jnp.float32)
    f_hi, _ = step_hi(place(f), 0.001, 0)
    assert float(jnp.max(jnp.abs(f_hi.p - f_out.p))) > 0.0


@pytest.mark.heavy
def test_dst_fused_sharded_convection_multi_step(dst_grid, zmesh):
    """Three buoyant steps (energy + Boussinesq + mixed thermal faces)
    through the sharded DST-fused path track the jnp integrator."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      alpha=1e-3, beta=0.05, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.05), thermal_bc=thermal)
    rng = np.random.default_rng(31)
    f = _random_field(dst_grid, seed=23)
    f = f.replace(T=jnp.asarray(300.0 + rng.normal(0, 1.0, dst_grid.shape),
                                jnp.float32))

    ref_step = jax.jit(make_projection_step(
        dst_grid, params, dtype=jnp.float32,
        poisson_method=Method.FFT_DIRECT))
    step, place = make_sharded_step(dst_grid, params, zmesh, "projection",
                                    use_pallas=True, dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(3):
        fr, _ = ref_step(fr, 0.001, i)
        fs, res = step(fs, 0.001, i)
    assert int(res.status) == 0
    for name in ("u", "v", "w", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=3e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=2e-4)


# ---------------------------------------------------------------------------
# Consistent-scheme (stretched x/y) z-sharded projection (r5): the
# eigenbasis-fused mega kernels per shard — nonuniform weight pins are
# z-invariant, the generalized-eigenbasis xy transforms are plane-local —
# with the z line solve over generalized eigenvalue sums as the only
# cross-shard stage (`nonuniform.make_nonuniform_fused_sharded_pieces`).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cons_grid():
    # nz % 8 with >= 2 planes/shard; ny % 8 == 0 with ny/8 slab rows for
    # the y-pencil TDMA; nx % 128 == 0 for the marching kernels
    return Grid.stretched(128, 64, 16, zmin=0.0, zmax=1.0, beta=1.5,
                          stretch_axes="xy")


def _cons_params(**kw):
    return NSParams(nonuniform_scheme="consistent", **kw)


def test_consistent_sharded_selected(cons_grid, zmesh, monkeypatch):
    """The eigenbasis-fused branch is picked for consistent-scheme
    stretched grids on a z mesh (and the parity scheme keeps the uniform
    DST family)."""
    import cfd_tpu.solvers.poisson.nonuniform as nonuniform_mod

    calls = []
    orig = nonuniform_mod.make_nonuniform_fused_sharded_pieces

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(nonuniform_mod,
                        "make_nonuniform_fused_sharded_pieces", spy)
    make_fused_sharded_projection_step(cons_grid, _cons_params(), zmesh)
    assert len(calls) == 1


def test_consistent_sharded_matches_jnp(cons_grid, zmesh):
    """One step of the consistent-scheme sharded mega path vs the
    single-device jnp consistent step (exact 3-point operators +
    generalized-eigenbasis direct solve)."""
    params = _cons_params()
    f = _random_field(cons_grid, seed=41)

    ref_step = jax.jit(make_projection_step(
        cons_grid, params, dtype=jnp.float32, use_pallas=False,
        poisson_method=Method.FFT_DIRECT))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    step, place = make_sharded_step(cons_grid, params, zmesh,
                                    "projection", use_pallas=True,
                                    dtype=jnp.float32)
    f_out, res = step(place(f), 0.001, 0)
    assert int(res.status) == int(res_ref.status) == 0
    assert len(f_out.u.sharding.device_set) == 8
    for name in ("u", "v", "w"):
        np.testing.assert_allclose(np.asarray(getattr(f_out, name)),
                                   np.asarray(getattr(f_ref, name)),
                                   atol=5e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               atol=5e-4)


@pytest.mark.heavy
def test_consistent_sharded_buoyant_multi_step(cons_grid, zmesh):
    """Three buoyant consistent-scheme steps (energy + Boussinesq on the
    stretched grid — the consistent thermal stencils ride the same
    scheme) track the jnp integrator."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    thermal = ThermalBCConfig(
        left=BCType.DIRICHLET, right=BCType.DIRICHLET,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
        dirichlet_values=DirichletValues(left=305.0, right=295.0))
    params = _cons_params(
        source_amplitude_u=0.0, source_amplitude_v=0.0,
        alpha=1e-3, beta=0.05, T_ref=300.0,
        gravity=(0.0, -9.81, 0.05), thermal_bc=thermal)
    rng = np.random.default_rng(47)
    f = _random_field(cons_grid, seed=43)
    f = f.replace(T=jnp.asarray(
        300.0 + rng.normal(0, 1.0, cons_grid.shape), jnp.float32))

    ref_step = jax.jit(make_projection_step(
        cons_grid, params, dtype=jnp.float32, use_pallas=False,
        poisson_method=Method.FFT_DIRECT))
    step, place = make_sharded_step(cons_grid, params, zmesh,
                                    "projection", use_pallas=True,
                                    dtype=jnp.float32)
    fr, fs = f, place(f)
    for i in range(3):
        fr, _ = ref_step(fr, 0.001, i)
        fs, res = step(fs, 0.001, i)
    assert int(res.status) == 0
    for name in ("u", "v", "w", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fs, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=3e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(fs.p), np.asarray(fr.p),
                               atol=3e-3)


def test_consistent_sharded_unsupported_reasons(zmesh):
    """Krylov methods and non-z meshes decline cleanly (jnp GSPMD
    fallback carries the FV-symmetrized solves)."""
    g = Grid.stretched(128, 64, 16, zmin=0.0, zmax=1.0, beta=1.5,
                       stretch_axes="xy")
    with pytest.raises(ValueError, match="FFT_DIRECT"):
        make_fused_sharded_projection_step(
            g, _cons_params(), zmesh, poisson_method=Method.CG)
    zy = _zy_mesh(2, 4)
    reason = fused_sharded_unsupported_reason(
        g, _cons_params(), zy, jnp.float32)
    assert reason is not None and "z-only" in reason
    g2d = Grid.stretched(128, 64, 1, beta=1.5, stretch_axes="xy")
    ymesh = make_mesh(axes=("y",))
    reason = fused_sharded_unsupported_reason(
        g2d, _cons_params(), ymesh, jnp.float32)
    assert reason is not None and "2D consistent" in reason
