"""Hybrid differentiable steps (fused forward + jnp adjoint, `ns.hybrid`).

Interpret-mode Pallas on CPU: the hybrid step's *value* must equal the
fused step's, and its *gradient* must match the jnp step's gradient (the
adjoint is the jnp linearization by construction — these tests guard the
custom_vjp plumbing: residual threading, int cotangents, rollout/remat
composition).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.solvers.ns import NSParams, make_euler_step, make_rollout
from cfd_tpu.solvers.ns.rk import make_rk2_step

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
        p=jnp.asarray(rng.normal(0, amp, g.shape), jnp.float32))


def _loss_of(step):
    def loss(u, dt):
        f, _ = step(_field(seed=1).replace(u=u), dt, 3)
        return 0.5 * jnp.sum(f.u ** 2 + f.v ** 2 + f.w ** 2)
    return loss


@pytest.mark.parametrize("maker", [make_euler_step, make_rk2_step],
                         ids=["euler", "rk2"])
def test_hybrid_value_and_grad(maker):
    g = _grid()
    params = NSParams(source_amplitude_u=0.1, source_amplitude_v=0.05)
    hybrid = maker(g, params, dtype=jnp.float32, use_pallas=True,
                   pallas_interpret=True, differentiable=True)
    fused = maker(g, params, dtype=jnp.float32, use_pallas=True,
                  pallas_interpret=True)
    ref = maker(g, params, dtype=jnp.float32, use_pallas=False)

    f, dt = _field(seed=1), 5e-5
    fh, rh = jax.jit(hybrid)(f, dt, 3)
    ff, rf = jax.jit(fused)(f, dt, 3)
    for name in ("u", "v", "w", "p", "T"):
        np.testing.assert_array_equal(np.asarray(getattr(fh, name)),
                                      np.asarray(getattr(ff, name)),
                                      err_msg=name)
    assert int(rh.status) == int(rf.status) == 0

    # Gradient w.r.t. the initial velocity AND dt == jnp-path gradient.
    gh_u, gh_dt = jax.jit(jax.grad(_loss_of(hybrid), argnums=(0, 1)))(
        f.u, jnp.float32(dt))
    gr_u, gr_dt = jax.jit(jax.grad(_loss_of(ref), argnums=(0, 1)))(
        f.u, jnp.float32(dt))
    np.testing.assert_allclose(np.asarray(gh_u), np.asarray(gr_u),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(gh_dt), float(gr_dt), rtol=1e-5)


def test_hybrid_composes_with_rollout_remat():
    g = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    hybrid = make_euler_step(g, params, dtype=jnp.float32, use_pallas=True,
                             pallas_interpret=True, differentiable=True)
    ref = make_euler_step(g, params, dtype=jnp.float32, use_pallas=False)
    f = _field(seed=2, amp=0.1)

    def loss_with(step):
        roll = make_rollout(step, 3, remat="step")
        def loss(u):
            out, _ = roll(f.replace(u=u), 5e-5)
            return 0.5 * jnp.sum(out.u ** 2 + out.v ** 2)
        return loss

    gh = jax.jit(jax.grad(loss_with(hybrid)))(f.u)
    gr = jax.jit(jax.grad(loss_with(ref)))(f.u)
    assert np.all(np.isfinite(np.asarray(gh)))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gr),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.heavy
def test_hybrid_projection_value_and_grad():
    from cfd_tpu.solvers.ns import make_projection_step
    from cfd_tpu.solvers.poisson import Method

    g = _grid()
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0)
    kw = dict(dtype=jnp.float32, poisson_method=Method.FFT_DIRECT)
    hybrid = make_projection_step(g, params, use_pallas=True,
                                  pallas_interpret=True,
                                  differentiable=True, **kw)
    fused = make_projection_step(g, params, use_pallas=True,
                                 pallas_interpret=True, **kw)
    ref = make_projection_step(g, params, use_pallas=False,
                               differentiable=True, **kw)

    f, dt = _field(seed=4, amp=0.1), 1e-3
    fh, rh = jax.jit(hybrid)(f, dt, 0)
    ff, _ = jax.jit(fused)(f, dt, 0)
    np.testing.assert_array_equal(np.asarray(fh.u), np.asarray(ff.u))
    np.testing.assert_array_equal(np.asarray(fh.p), np.asarray(ff.p))
    assert int(rh.status) == 0

    gh = jax.jit(jax.grad(_loss_of(hybrid)))(f.u, jnp.float32(dt))
    gr = jax.jit(jax.grad(_loss_of(ref)))(f.u, jnp.float32(dt))
    # Adjoint is the jnp linearization in both, so the only difference
    # is the fused forward VALUE entering the loss cotangent: since r4
    # the fused projection is the DST-fused mega family (~1e-6-class vs
    # jnp), which lands here as a measured 1.5e-7 gradient perturbation
    # at |∇| ≈ 0.4 (the inexact-primal/exact-adjoint trade the hybrid
    # docstring advertises).
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gr),
                               rtol=1e-5, atol=5e-7)


def test_differentiable_without_pallas_pins_jnp():
    # differentiable=True alone must keep the plain jnp step (no
    # custom_vjp wrapper), which supports forward-mode too.
    g = _grid()
    step = make_euler_step(g, NSParams(), dtype=jnp.float32,
                           differentiable=True)
    f = _field(seed=3, amp=0.1)

    def loss(u):
        out, _ = step(f.replace(u=u), 5e-5, 0)
        return jnp.sum(out.u ** 2)

    # jacfwd would raise on a custom_vjp-wrapped step.
    tangent = jnp.ones_like(f.u)
    _, jvp_val = jax.jvp(loss, (f.u,), (tangent,))
    assert np.isfinite(float(jvp_val))
