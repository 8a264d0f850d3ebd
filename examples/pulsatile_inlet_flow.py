"""Time-varying inlets: sinusoidal, ramp, step (port of
examples/pulsatile_inlet_flow.c)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import (InletConfig, OutletConfig, apply_inlet,
                              apply_noslip, apply_outlet_velocity)
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.projection import make_projection_step

NX, NY = 64, 32
DT = 1e-3
grid = Grid.uniform(NX, NY, xmin=0.0, xmax=2.0, ymin=0.0, ymax=1.0)
params = NSParams(dt=DT, mu=0.05, max_iter=1,
                  source_amplitude_u=0.0, source_amplitude_v=0.0)
step = make_projection_step(grid, params)
outlet = OutletConfig.zero_gradient()

CONFIGS = {
    "sinusoidal": InletConfig.time_sinusoidal(
        1.0, 0.0, frequency=2.0, amplitude=0.5, phase=0.0, offset=1.0),
    "ramp": InletConfig.time_ramp(1.0, 0.0, t_start=0.0, t_end=0.2,
                                  value_start=0.0, value_end=1.0),
    "step": InletConfig.time_step(1.0, 0.0, t_step=0.1,
                                  value_before=0.2, value_after=1.0),
}

for name, inlet in CONFIGS.items():
    def one_step(field, i, inlet=inlet):
        t = i * DT
        u, v = apply_noslip(field.u, field.v)
        u, v = apply_inlet(u, v, inlet, time=t, dt=DT)
        u, v = apply_outlet_velocity(u, v, outlet)
        field = field.replace(u=u, v=v)
        field, res = step(field, DT, i)
        return field, field.u[0, NY // 2, 0]

    run = jax.jit(lambda f, fn=one_step: lax.scan(fn, f, jnp.arange(300)))
    field, inlet_trace = run(FlowField.quiescent(NX, NY, pressure=0.0))
    tr = np.asarray(inlet_trace)
    print(f"{name:>10}: inlet u(t) min={tr.min():.3f} max={tr.max():.3f} "
          f"final={tr[-1]:.3f}")
