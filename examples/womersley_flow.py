"""Womersley flow: oscillatory channel vs the analytic solution.

The pulsatile-flow physics behind `pulsatile_inlet_flow.py`
(`/root/reference/examples/pulsatile_inlet_flow.c:5-10`), taken to its
analytic anchor: a channel driven by a uniform oscillatory body force
G·cos(ωt) develops the Womersley profile

    u(y, t) = Re[(G/iω)(1 − cosh(λy)/cosh(λh)) e^{iωt}],  λ = √(iω/ν)

— quasi-parabolic at low Womersley number α = h√(ω/ν), annular
(overshooting near the walls, lagging in the core) at high α.  This
example runs α = 3 and prints the simulated vs analytic centerplane
profile at four phases of the final cycle.

    JAX_PLATFORMS=cpu python examples/womersley_flow.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import apply_neumann_scalar, apply_periodic_scalar
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.poisson.base import Method

ALPHA = 3.0
NU = 0.05
NY, NX = 65, 32
H = 0.5
OMEGA = ALPHA * ALPHA * NU / (H * H)
G = 1.0
DT = 2.5e-4
CYCLES = 3.0


def main():
    period = 2.0 * np.pi / OMEGA
    steps = int(round(CYCLES * period / DT))

    def source(X, Y, Z, t):
        su = G * jnp.cos(OMEGA * t)
        return (jnp.broadcast_to(su, X.shape), jnp.zeros_like(X),
                jnp.zeros_like(X))

    grid = Grid.uniform(NX, NY, xmax=8.0, ymax=1.0)
    params = NSParams(mu=NU, source_amplitude_u=0.0,
                      source_amplitude_v=0.0, source_func=source)
    step = make_projection_step(grid, params,
                                poisson_method=Method.FFT_DIRECT)

    def body(field, i):
        u = apply_periodic_scalar(field.u)
        v = apply_periodic_scalar(field.v)
        u = u.at[0, 0, :].set(0.0).at[0, -1, :].set(0.0)
        v = v.at[0, 0, :].set(0.0).at[0, -1, :].set(0.0)
        field = field.replace(u=u, v=v, p=apply_neumann_scalar(field.p))
        field, res = step(field, DT, i)
        return field, field.u[0, :, NX // 2]

    @jax.jit
    def run(field):
        return lax.scan(body, field, jnp.arange(steps))

    _, profiles = run(FlowField.quiescent(NX, NY, pressure=0.0))
    profiles = np.asarray(profiles)

    y = np.linspace(0.0, 1.0, NY)
    lam = np.sqrt(1j * OMEGA / NU)
    prof_hat = (G / (1j * OMEGA)) * (
        1.0 - np.cosh(lam * (y - 0.5)) / np.cosh(lam * H))

    print(f"Womersley alpha={ALPHA}  (omega={OMEGA:.3f}, period="
          f"{period:.2f}, {steps} steps)")
    print(f"{'phase':>8} {'y=0.25 sim/exact':>22} {'y=0.50 sim/exact':>22}")
    for k in range(4):
        idx = steps - 1 - int(round(k * period / 4 / DT))
        t = (idx + 1) * DT
        exact = np.real(prof_hat * np.exp(1j * OMEGA * t))
        sim = profiles[idx]
        j25, j50 = NY // 4, NY // 2
        print(f"{k / 4:8.2f} {sim[j25]:10.4f}/{exact[j25]:<10.4f}"
              f" {sim[j50]:10.4f}/{exact[j50]:<10.4f}")
    err = np.abs(profiles[steps - 1] - np.real(
        prof_hat * np.exp(1j * OMEGA * steps * DT))).max()
    print(f"final-profile max error: {err:.4f} "
          f"({100 * err / np.abs(prof_hat).max():.1f}% of peak)")


if __name__ == "__main__":
    main()
