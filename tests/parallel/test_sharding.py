"""Sharded-vs-single-device consistency tests on the 8-virtual-device CPU
mesh (SURVEY.md §4's multi-backend-without-hardware strategy, TPU edition)."""

import jax
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.parallel import (factor_devices, field_spec, make_mesh,
                              make_sharded_step, shard_field)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step


def test_virtual_device_count():
    assert len(jax.devices()) == 8


def test_factor_devices():
    assert factor_devices(8) == (2, 4)
    assert factor_devices(4) == (2, 2)
    assert factor_devices(1) == (1, 1)
    assert factor_devices(6) == (2, 3)


def test_mesh_and_spec():
    mesh = make_mesh(axes=("z", "y"))
    assert mesh.shape == {"z": 2, "y": 4}
    spec3 = field_spec(mesh, is_3d=True)
    assert spec3 == jax.sharding.PartitionSpec("z", "y", None)
    spec2 = field_spec(mesh, is_3d=False)
    assert spec2 == jax.sharding.PartitionSpec(None, "y", None)
    mesh1 = make_mesh(axes=("y",))
    assert field_spec(mesh1, is_3d=False) == \
        jax.sharding.PartitionSpec(None, "y", None)


@pytest.mark.parametrize("method", ["explicit_euler", "projection"])
def test_sharded_matches_single_device_2d(method):
    g = Grid.uniform(32, 32)
    params = NSParams()
    f = FlowField.initialize(g)

    from cfd_tpu.parallel.sharded import _BUILDERS
    ref_step = jax.jit(_BUILDERS[method](g, params))
    f_ref, res_ref = ref_step(f, 0.001, 0)

    mesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, mesh, method)
    f_sh = place(f)
    f_out, res_out = step(f_sh, 0.001, 0)

    np.testing.assert_allclose(np.asarray(f_out.u), np.asarray(f_ref.u),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               rtol=1e-10, atol=1e-10)
    assert int(res_out.status) == int(res_ref.status) == 0


def test_sharded_projection_3d_mesh2d():
    """3D field over the full 2×4 (z, y) mesh, vs single device."""
    g = Grid.uniform(16, 16, 16, zmin=0, zmax=1)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = FlowField.initialize(g)

    ref_step = jax.jit(make_projection_step(g, params))
    f_ref, _ = ref_step(f, 0.001, 0)

    mesh = make_mesh(axes=("z", "y"))
    step, place = make_sharded_step(g, params, mesh, "projection")
    f_out, res = step(place(f), 0.001, 0)

    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(f_out.u), np.asarray(f_ref.u),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               rtol=1e-8, atol=1e-8)
    # output actually sharded over the mesh
    assert len(f_out.u.sharding.device_set) == 8


def test_sharded_multi_step_scan():
    """Several sharded steps stay finite and consistent."""
    g = Grid.uniform(16, 32)
    params = NSParams()
    f = FlowField.initialize(g)
    mesh = make_mesh(axes=("y",))
    step, place = make_sharded_step(g, params, mesh, "explicit_euler")
    fs = place(f)
    for i in range(3):
        fs, res = step(fs, 0.001, i)
    assert bool(fs.is_finite())

    ref_step = jax.jit(
        __import__("cfd_tpu.solvers.ns.euler", fromlist=["make_euler_step"])
        .make_euler_step(g, params))
    fr = f
    for i in range(3):
        fr, _ = ref_step(fr, 0.001, i)
    np.testing.assert_allclose(np.asarray(fs.u), np.asarray(fr.u),
                               rtol=1e-12, atol=1e-12)


def test_sharded_projection_fft_direct():
    """Spectral pressure solve under GSPMD: the DST einsums over sharded
    y/z axes lower to collectives; result matches the single-device step."""
    from cfd_tpu.solvers.poisson.base import Method

    g = Grid.uniform(16, 16, 16, zmin=0, zmax=1)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    f = FlowField.initialize(g)

    ref_step = jax.jit(make_projection_step(
        g, params, poisson_method=Method.FFT_DIRECT))
    f_ref, _ = ref_step(f, 0.001, 0)

    mesh = make_mesh(axes=("z", "y"))
    step, place = make_sharded_step(g, params, mesh, "projection",
                                    poisson_method=Method.FFT_DIRECT)
    f_out, res = step(place(f), 0.001, 0)

    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(f_out.u), np.asarray(f_ref.u),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(f_out.p), np.asarray(f_ref.p),
                               rtol=1e-8, atol=1e-8)
    assert len(f_out.u.sharding.device_set) == 8
