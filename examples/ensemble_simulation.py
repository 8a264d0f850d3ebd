"""Ensemble simulation: a viscosity sweep in ONE compiled XLA program.

Extension component — the C reference runs one simulation per process
(`simulation_api.c:24-127`); a parameter study there is a shell loop over
program invocations.  On TPU an ensemble is just a leading batch axis:
``jax.vmap`` lifts the whole rollout (step factory included — NSParams
fields are trace-safe) so N members share one compile and run batched.

Here: Taylor-Green vortices at 8 viscosities, integrated together, each
member's kinetic-energy decay rate checked against the analytic
KE(t) = KE(0)·exp(−4νt).  Batched adjoints (vmap-of-grad) give every
member's sensitivity d KE(T) / d ν in a second single program.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

from cfd_tpu import FlowField, Grid                     # noqa: E402
from cfd_tpu.solvers.ns import (NSParams, make_rk2_step,  # noqa: E402
                                make_rollout)

N = 33
STEPS = 200
DT = 1e-3

grid = Grid.uniform(N, N, xmin=0, xmax=2 * np.pi, ymin=0, ymax=2 * np.pi)
X, Y, _ = grid.coordinate_arrays()
f0 = FlowField.quiescent(N, N, 1).replace(
    u=jnp.cos(X) * jnp.sin(Y), v=-jnp.sin(X) * jnp.cos(Y))

nus = jnp.linspace(0.005, 0.04, 8)


def final_ke(nu):
    params = NSParams(mu=nu, source_amplitude_u=0.0, source_amplitude_v=0.0)
    step = make_rk2_step(grid, params, use_pallas=False)
    roll = make_rollout(step, STEPS, remat="sqrt")
    f, _ = roll(f0, DT)
    return 0.5 * jnp.mean(f.u ** 2 + f.v ** 2)


ke0 = 0.5 * float(jnp.mean(f0.u ** 2 + f0.v ** 2))
t = STEPS * DT

print(f"ensemble of {len(nus)} members, {N}x{N}, {STEPS} steps, one program")
ke = jax.jit(jax.vmap(final_ke))(nus)
dke_dnu = jax.jit(jax.vmap(jax.grad(final_ke)))(nus)

print(f"{'nu':>8} {'KE(T)/KE0':>10} {'analytic':>10} {'dKE/dnu':>10}")
for i, nu in enumerate(np.asarray(nus)):
    measured = float(ke[i]) / ke0
    exact = float(np.exp(-4 * nu * t))
    print(f"{nu:8.4f} {measured:10.5f} {exact:10.5f} {float(dke_dnu[i]):10.4f}")
    assert abs(measured - exact) < 0.02, "decay rate off analytic"
    assert float(dke_dnu[i]) < 0.0, "KE must fall with viscosity"

print("OK: batched rollouts and batched adjoints match the analytic decay")
