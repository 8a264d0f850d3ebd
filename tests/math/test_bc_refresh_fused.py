"""bc_refresh × fused-kernel composition (r4 verdict item 5).

The stale-shell fix (`make_projection_step(bc_refresh=...)`) must keep the
kernel fast paths: in 3D the hook runs between the per-component predictor
kernels and the standalone b̃ kernel (which carries the mega sweep's
in-kernel DST transforms + Thomas forward carry), in 2D the two-pass split
kernels (`Projection2DKernels(split=True)`) re-apply caller BCs between
the predictor and b̃ sweeps.  Interpret-mode consistency vs the jnp body
with the same hook.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method


def _bcs(u, v, w, t):
    """A time-dependent driven-lid-style refresh."""
    lid = 0.5 + 0.1 * jnp.sin(3.0 * t)
    u = u.at[:, 0, :].set(0.0).at[:, -1, :].set(lid)
    v = v.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    return u, v, w


def _field(shape, seed=0, amp=0.1):
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape
    f = FlowField.zeros(nx, ny, nz, dtype=jnp.float32)
    return f.replace(
        u=jnp.asarray(rng.normal(0, amp, shape), jnp.float32),
        v=jnp.asarray(rng.normal(0, amp, shape), jnp.float32),
        w=jnp.asarray(rng.normal(0, amp, shape), jnp.float32),
        p=jnp.asarray(rng.normal(0, amp, shape), jnp.float32))


def _pair(grid, params, method, **kw):
    ref = jax.jit(make_projection_step(grid, params, dtype=jnp.float32,
                                       poisson_method=method,
                                       use_pallas=False, bc_refresh=_bcs,
                                       **kw))
    fus = jax.jit(make_projection_step(grid, params, dtype=jnp.float32,
                                       poisson_method=method,
                                       use_pallas=True,
                                       pallas_interpret=True,
                                       bc_refresh=_bcs, **kw))
    return ref, fus


def _assert_close(ref, fus, f, atol, steps=2):
    fr = ff = f
    for i in range(steps):
        fr, rr = ref(fr, 1e-3, i)
        ff, rf = fus(ff, 1e-3, i)
        assert int(rf.status) == int(rr.status) == 0
    for name in ("u", "v", "w", "p"):
        np.testing.assert_allclose(np.asarray(getattr(ff, name)),
                                   np.asarray(getattr(fr, name)),
                                   atol=atol, err_msg=name)


@pytest.mark.parametrize("method", [Method.FFT_DIRECT, Method.CG])
def test_bc_refresh_2d_split_fused_matches_jnp(method):
    """2D two-pass split kernels (previously a jnp-body cliff)."""
    g = Grid.uniform(128, 32)
    params = NSParams(mu=0.01, source_amplitude_u=0.0,
                      source_amplitude_v=0.0)
    ref, fus = _pair(g, params, method)
    _assert_close(ref, fus, _field((1, 32, 128), seed=1), atol=2e-5)


def test_bc_refresh_2d_dst_split_engages(monkeypatch):
    """At nx % 1024 shapes the 2D split path keeps the in-kernel DST."""
    from cfd_tpu.solvers.poisson import spectral as spectral_mod
    calls = []
    orig = spectral_mod.make_dst2d_fused_pieces

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(spectral_mod, "make_dst2d_fused_pieces", spy)
    g = Grid.uniform(1024, 32)
    params = NSParams(mu=0.01, source_amplitude_u=0.0,
                      source_amplitude_v=0.0)
    ref, fus = _pair(g, params, Method.FFT_DIRECT)
    assert calls, "DST-fused 2D split path did not engage"
    _assert_close(ref, fus, _field((1, 32, 1024), seed=2), atol=2e-5,
                  steps=1)


def test_bc_refresh_3d_dst_engages(monkeypatch):
    """The 3D bc_refresh path keeps the DST-fused family via the
    standalone b̃ kernel (in-kernel transforms + Thomas forward carry)."""
    from cfd_tpu.solvers.poisson import spectral as spectral_mod
    calls = []
    orig = spectral_mod.make_dst_fused_pieces

    def spy(*a, **kw):
        calls.append(kw.get("fuse_fwd", False))
        return orig(*a, **kw)

    monkeypatch.setattr(spectral_mod, "make_dst_fused_pieces", spy)
    g = Grid.uniform(128, 16, 8, zmin=0.0, zmax=1.0)
    params = NSParams(mu=0.01, source_amplitude_u=0.0,
                      source_amplitude_v=0.0)
    ref, fus = _pair(g, params, Method.FFT_DIRECT)
    assert calls, "DST-fused pieces not built on the bc_refresh path"
    _assert_close(ref, fus, _field((8, 16, 128), seed=3), atol=2e-5)


def test_split_kernels_gating():
    from cfd_tpu.ops.pallas.projection2d import Projection2DKernels
    g = Grid.uniform(128, 32)
    pk = Projection2DKernels(g.ny, g.nx, g.dx0, g.dy0, g.xmin, g.ymin,
                             interpret=True, split=True)
    assert pk.split_ok
    with pytest.raises(ValueError):
        Projection2DKernels(g.ny, g.nx, g.dx0, g.dy0, g.xmin, g.ymin,
                            interpret=True, split=True, global_ny=128)
