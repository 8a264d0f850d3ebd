"""Probe: where the 2048^2 fused 2D projection step's time goes on-chip.

Times each stage marginally inside one jit (same methodology as
step_breakdown_probe.py): the 2D marching predictor/corrector kernels,
the 2D DST matmul chain at HIGHEST and HIGH, the diagnostics tail, and
the whole step, to find what bounds the 1.1 GLUPS 2D number.

Run on the TPU box:  python artifacts/step2d_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

N = 2048


def timed(fn, args, s_pair=(2, 12), tag=""):
    @jax.jit
    def many(args, eps_arr):
        def body(tot, eps):
            out = fn(*args, eps)
            return tot + out, 0
        tot, _ = lax.scan(body, jnp.float32(0.0), eps_arr)
        return tot

    meas = {}
    for S in s_pair:
        eps = jnp.linspace(0.0, 1e-5, S).astype(jnp.float32)
        float(many(args, eps))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(args, eps))
            best = min(best, time.perf_counter() - t0)
        meas[S] = best
    s1, s2 = s_pair
    ms = (meas[s2] - meas[s1]) / (s2 - s1) * 1e3
    print(f"{tag:34s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    from cfd_tpu import FlowField, Grid
    from cfd_tpu.ops.pallas.projection2d import Projection2DKernels
    from cfd_tpu.solvers.poisson.base import (Method, PoissonParams,
                                              PoissonProblem)
    from cfd_tpu.solvers.poisson.spectral import make_fft_btilde_solver
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.common import field_status_and_diagnostics
    from cfd_tpu.solvers.ns.projection import make_projection_step

    print("devices:", jax.devices(), flush=True)
    grid = Grid.uniform(N, N)
    dx = grid.dx0

    @jax.jit
    def make_fields():
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        mk = lambda k: 0.1 * jax.random.normal(k, (1, N, N), jnp.float32)
        return mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3])

    u, v, p, T = make_fields()
    w = jnp.zeros_like(u)
    jax.block_until_ready(p)
    print("fields built", flush=True)

    pk = Projection2DKernels(N, N, dx, dx, 0.0, 0.0, jnp.float32)
    problem = PoissonProblem(N, N, 1, dx, dx, 0.0)
    dt = jnp.float32(1e-5)
    mu = 0.01

    def pred(u_, v_, w_, p_, eps):
        us, vs, ws, pin = pk.predictor_and_poisson_input(
            u_ * (1 + eps), v_, w_, p_, dt, mu, 0.0, 0.0, 1.0 / dt)
        return us[0, 1, 1] + pin[0, 1, 1]
    timed(pred, (u, v, w, p), tag="predictor+btilde kernel")

    for prec, tag in ((lax.Precision.HIGHEST, "HIGHEST"),
                      (lax.Precision.HIGH, "HIGH")):
        pipeline = make_fft_btilde_solver(problem, PoissonParams(),
                                          precision=prec)

        def dst(pin, eps):
            out = pipeline(pin * (1 + eps))
            return out[0, 1, 1]
        timed(dst, (p,), tag=f"DST pipeline ({tag})")

    def corr(us, vs, pn, eps):
        uu, vv = pk.corrector(us * (1 + eps), vs, pn, dt)
        return uu[0, 1, 1] + vv[0, 1, 1]
    timed(corr, (u, v, p), tag="corrector kernel")

    def diag(u_, v_, w_, pn, T_, eps):
        field = FlowField(u=u_ * (1 + eps), v=v_, w=w_, p=pn,
                          rho=jnp.ones((1, N, N), jnp.float32), T=T_)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(field)
        return vmax + pmax + tmax + finite.astype(jnp.float32)
    timed(diag, (u, v, w, p, T), tag="diagnostics tail")

    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0, mu=mu)
    step = make_projection_step(grid, params, dtype=jnp.float32,
                                poisson_method=Method.FFT_DIRECT,
                                use_pallas=True)

    def whole(u_, v_, w_, p_, T_, eps):
        field = FlowField(u=u_ * (1 + eps), v=v_, w=w_, p=p_,
                          rho=jnp.ones((1, N, N), jnp.float32), T=T_)
        f2, res = step(field, dt, 0)
        return f2.u[0, 1, 1] + res.max_velocity
    timed(whole, (u, v, w, p, T), tag="WHOLE fused step")


if __name__ == "__main__":
    main()
