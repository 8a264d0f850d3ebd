"""Animated analytic vortex: prescribed fields written as VTK frames.

Port of examples/simple_animated_flow.c — no solver at all: a moving
Gaussian vortex over an oscillating background flow is evaluated
analytically each frame and written through the output pipeline so the
frames can be loaded as a ParaView/VisIt time series.
"""

import numpy as np
import jax.numpy as jnp

from cfd_tpu import FlowField, Grid
from cfd_tpu.io.vtk import write_vtk_vector

N = 65
FRAMES = 20
DT = 0.05

VORTEX_AMP_X, VORTEX_AMP_Y = 0.5, 0.3
STRENGTH_BASE, STRENGTH_VAR, STRENGTH_FREQ = 3.0, 0.5, 2.0
SIZE_FACTOR, DECAY = 0.5, 1.0
BG_U_BASE, BG_U_VAR = 0.5, 0.3
BG_V_AMP, BG_V_FREQ = 0.2, 2.0

grid = Grid.uniform(N, N)
X = grid.x[None, None, :]
Y = grid.y[None, :, None]


def vortex_field(t: float) -> FlowField:
    cx = 0.5 + VORTEX_AMP_X * 0.5 * np.sin(2 * np.pi * 0.5 * t)
    cy = 0.5 + VORTEX_AMP_Y * 0.5 * np.cos(2 * np.pi * 0.3 * t)
    strength = STRENGTH_BASE + STRENGTH_VAR * np.sin(STRENGTH_FREQ * t)
    dx, dy = X - cx, Y - cy
    r2 = dx * dx + dy * dy
    swirl = strength * np.exp(-DECAY * r2 / SIZE_FACTOR)
    u = BG_U_BASE + BG_U_VAR * np.sin(2 * np.pi * t) - swirl * dy
    v = BG_V_AMP * np.sin(BG_V_FREQ * t) + swirl * dx
    shape = (1, N, N)
    return FlowField(u=jnp.broadcast_to(u, shape).astype(jnp.float64),
                     v=jnp.broadcast_to(v, shape).astype(jnp.float64),
                     w=jnp.zeros(shape), p=jnp.ones(shape),
                     rho=jnp.ones(shape), T=jnp.full(shape, 300.0))


for frame in range(FRAMES):
    f = vortex_field(frame * DT)
    path = f"simple_animated_{frame:04d}.vtk"
    write_vtk_vector(path, "velocity", f.u, f.v, f.w, N, N, 1,
                     grid.xmin, grid.xmax, grid.ymin, grid.ymax)
    print(f"frame {frame:2d}: wrote {path}")

print(f"\n{FRAMES} frames written — open simple_animated_*.vtk as a "
      "time series in ParaView.")
