"""Taylor-Green vortex convergence study (port of
examples/taylor_green_convergence.c)."""

import numpy as np

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tests.validation.harness import run_taylor_green  # noqa: E402

NU = 0.01
errors = []
sizes = (16, 32, 64)
for n in sizes:
    h = 2 * np.pi / (n - 1)
    dt = 5e-4 * (n - 1) / 127
    steps = int(round(0.1 / dt))
    f0, f1, grid, statuses = run_taylor_green("projection", n, steps, dt, NU)
    assert (statuses == 0).all()
    t = steps * dt
    X = np.broadcast_to(np.asarray(grid.x)[None, None, :], grid.shape)
    Y = np.broadcast_to(np.asarray(grid.y)[None, :, None], grid.shape)
    u_exact = np.cos(X) * np.sin(Y) * np.exp(-2 * NU * t)
    err = np.sqrt(((np.asarray(f1.u) - u_exact) ** 2).mean())
    errors.append(err)
    print(f"{n:4d}^2: L2 error = {err:.3e}")

for i in range(1, len(sizes)):
    rate = np.log2(errors[i - 1] / errors[i])
    print(f"rate {sizes[i-1]}->{sizes[i]}: {rate:.2f}")
