"""Probe: where the 512^3 fused projection step's time goes on-chip.

Times each stage of the fused step (mega predictor+btilde kernel, DST
pipeline, corrector+diag kernel, diagnostics tail) marginally inside one
jit, plus the whole step, to find non-roofline overhead.

Run on the TPU box:  python artifacts/step_breakdown_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 512


def timed(fn, args, s_pair=(2, 12), tag=""):
    """Marginal ms/op: fn(*args, eps_scalar) chained S times inside a jit."""
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
    print(f"{tag:34s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    from cfd_tpu import Grid
    from cfd_tpu.ops.pallas.projection_kernels import ProjectionKernels
    from cfd_tpu.solvers.poisson.base import PoissonParams, PoissonProblem
    from cfd_tpu.solvers.poisson.spectral import make_fft_btilde_solver
    from cfd_tpu.solvers.ns import NSParams
    from cfd_tpu.solvers.ns.projection import make_projection_step
    from cfd_tpu.solvers.poisson.base import Method

    print("devices:", jax.devices(), flush=True)
    grid = Grid.uniform(N, N, N, zmin=0.0, zmax=1.0)
    dx = grid.dx0

    @jax.jit
    def make_fields():
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        mk = lambda k: 0.1 * jax.random.normal(k, (N, N, N), jnp.float32)
        return mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3]), mk(ks[4])

    u, v, w, p, T = make_fields()
    jax.block_until_ready(p)
    print("fields built", flush=True)

    pk = ProjectionKernels(N, N, N, dx, dx, dx, 0.0, 0.0, jnp.float32,
                           emit="btilde", with_sources=False)
    assert pk.ok and pk.mega_ok
    problem = PoissonProblem(N, N, N, dx, dx, dx)
    pipeline = make_fft_btilde_solver(problem, PoissonParams())

    dt = jnp.float32(1e-4)
    mu = 0.01

    # 1. mega predictor + poisson-input kernel
    def pred(u, v, w, p, eps):
        us, vs, ws, pin = pk.predictor_poisson_input(
            u * (1 + eps), v, w, p, dt, mu, 0.0, 0.0, 1.0 / dt)
        return us[1, 1, 1] + pin[1, 1, 1]
    timed(pred, (u, v, w, p), tag="predictor+btilde kernel")

    # 2. DST pipeline
    def dst(pin, eps):
        out = pipeline(pin * (1 + eps))
        return out[1, 1, 1]
    timed(dst, (p,), tag="DST pipeline (HIGHEST)")

    # 3. corrector + diag kernel
    def corr(us, vs, ws, pn, eps):
        uu, vv, ww, m2i, pmaxi, pabsi = pk.corrector_diag(
            us * (1 + eps), vs, ws, pn, dt)
        return uu[1, 1, 1] + m2i + pmaxi + pabsi
    timed(corr, (u, v, w, p), tag="corrector+diag kernel")

    # 4. diagnostics tail (T max + shell maxima as in fused_step)
    def diag(u_, v_, w_, pn, T_, eps):
        def m2_face(k):
            return jnp.max(u_[k] ** 2 + v_[k] ** 2 + w_[k] ** 2)
        m2 = jnp.maximum(jnp.float32(0.0),
                         jnp.maximum(m2_face(0), m2_face(-1)))
        pmax = jnp.maximum(jnp.max(pn[0]), jnp.max(pn[-1]))
        pabs = jnp.maximum(jnp.max(jnp.abs(pn[0])),
                           jnp.max(jnp.abs(pn[-1])))
        tmax = jnp.max(T_ * (1 + eps))
        return m2 + pmax + pabs + tmax
    timed(diag, (u, v, w, p, T), tag="diagnostics tail")

    # 5. whole fused step (bench configuration)
    params = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                      mu=mu)
    step = make_projection_step(grid, params, dtype=jnp.float32,
                                poisson_method=Method.FFT_DIRECT,
                                use_pallas=True)
    from cfd_tpu import FlowField

    def whole(u_, v_, w_, p_, T_, eps):
        # rho built in-trace (a closed-over 512 MB constant would be baked
        # into the HLO and trip the remote-compile 413 limit)
        field = FlowField(u=u_ * (1 + eps), v=v_, w=w_, p=p_,
                          rho=jnp.ones((N, N, N), jnp.float32), T=T_)
        f2, res = step(field, dt, 0)
        return f2.u[1, 1, 1] + res.max_velocity
    timed(whole, (u, v, w, p, T), tag="WHOLE fused step")


if __name__ == "__main__":
    main()
