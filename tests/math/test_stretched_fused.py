"""Stretched-grid fused kernels — interpret-mode consistency vs the jnp
step.  The per-point 1/(2h), 1/h² coefficients and the sin-source basis
ride pinned VMEM inputs (`ops/pallas/stretch.py`); these tests pin the
fused paths to the jnp per-point-spacing semantics
(`solvers/ns/common.spacing_arrays`, mirroring
`solver_explicit_euler.c:409`) on tanh-stretched x/y grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step

NZ, NY, NX = 8, 16, 128


def _grid(axes="xy"):
    return Grid.stretched(NX, NY, NZ, zmin=0.0, zmax=1.0, beta=1.5,
                          stretch_axes=axes)


def _field(grid, seed=0, amp=0.3):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)
    return f.replace(
        u=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32),
        T=jnp.asarray(300.0 + rng.normal(0, 1.0, grid.shape), jnp.float32))


def _assert_fields_close(fa, fb, atol):
    for name in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(fa, name)),
                                   np.asarray(getattr(fb, name)),
                                   atol=atol, err_msg=name)


def test_grid_stretch_axes():
    g = _grid("xy")
    assert not g.is_uniform("x") and not g.is_uniform("y")
    assert g.is_uniform("z")
    gx = Grid.stretched(NX, NY, 1, beta=2.0, stretch_axes="x")
    assert not gx.is_uniform("x") and gx.is_uniform("y")
    with pytest.raises(ValueError):
        Grid.stretched(NX, NY, beta=1.0, stretch_axes="q")


@pytest.mark.parametrize("sources", [True, False])
def test_stretched_euler_fused_matches_jnp(sources):
    g = _grid()
    amp = 0.1 if sources else 0.0
    params = NSParams(source_amplitude_u=amp, source_amplitude_v=amp / 2)
    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fus = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=True, pallas_interpret=True))
    f = _field(g, seed=1)
    fr, rr = ref(f, 5e-5, 3)
    ff, rf = fus(f, 5e-5, 3)
    assert int(rr.status) == int(rf.status) == 0
    _assert_fields_close(ff, fr, atol=2e-5)
    for attr in ("max_velocity", "max_pressure", "max_temperature"):
        np.testing.assert_allclose(float(getattr(rf, attr)),
                                   float(getattr(rr, attr)), rtol=1e-5,
                                   err_msg=attr)


def test_stretched_euler_buoyancy_matches_jnp():
    g = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      beta=0.2, T_ref=300.0, gravity=(0.0, -9.81, 0.0))
    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fus = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=True, pallas_interpret=True))
    f = _field(g, seed=2)
    fr, _ = ref(f, 5e-5, 0)
    ff, _ = fus(f, 5e-5, 0)
    _assert_fields_close(ff, fr, atol=2e-5)


@pytest.mark.heavy
@pytest.mark.parametrize("maker", [make_rk2_step, make_rk4_step],
                         ids=["rk2", "rk4"])
def test_stretched_rk_fused_matches_jnp(maker):
    g = _grid()
    params = NSParams(source_amplitude_u=0.1, source_amplitude_v=0.05)
    ref = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=False))
    fus = jax.jit(maker(g, params, dtype=jnp.float32, use_pallas=True,
                        pallas_interpret=True))
    f = _field(g, seed=3, amp=0.2)
    fr, rr = ref(f, 5e-5, 2)
    ff, rf = fus(f, 5e-5, 2)
    assert int(rr.status) == int(rf.status) == 0
    _assert_fields_close(ff, fr, atol=5e-5)


def test_stretched_multi_step_stays_consistent():
    g = _grid()
    params = NSParams(source_amplitude_u=0.05, source_amplitude_v=0.02)
    ref = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=False))
    fus = jax.jit(make_euler_step(g, params, dtype=jnp.float32,
                                  use_pallas=True, pallas_interpret=True))
    fa = fb = _field(g, seed=4, amp=0.1)
    for i in range(5):
        fa, _ = ref(fa, 5e-5, i)
        fb, _ = fus(fb, 5e-5, i)
    _assert_fields_close(fb, fa, atol=1e-4)


def test_stretched_energy_falls_back_to_jnp():
    # energy on a stretched grid is rejected by the energy validator —
    # the factory must raise (reference: energy_solver.c:55-91), not
    # silently drop the term in a fused kernel.
    from cfd_tpu.core.status import CFDError
    g = _grid()
    with pytest.raises(CFDError):
        make_euler_step(g, NSParams(alpha=0.1), dtype=jnp.float32,
                        use_pallas=True, pallas_interpret=True)
