"""Multi-device domain decomposition (new TPU-native capability; the
reference is single-node with MPI on its roadmap).

Run with virtual devices for a laptop demo:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/sharded_simulation.py
"""

import jax
import numpy as np

from cfd_tpu import FlowField, Grid
from cfd_tpu.parallel import make_mesh, make_sharded_step
from cfd_tpu.solvers.ns import NSParams

devices = jax.devices()
print(f"{len(devices)} devices: {devices[0].platform}")

grid = Grid.uniform(32, 32, 16, zmin=0.0, zmax=0.5)
params = NSParams(mu=0.01)
mesh = make_mesh(axes=("z", "y") if len(devices) > 1 else ("y",))
print(f"mesh: {dict(mesh.shape)}")

step, place = make_sharded_step(grid, params, mesh, "projection")
field = place(FlowField.initialize(grid))
print(f"field sharded over {len(field.u.sharding.device_set)} devices")

for i in range(5):
    field, res = step(field, 1e-3, i)
assert bool(field.is_finite())
print(f"5 sharded steps done, max|u| = {float(res.max_velocity):.4f}")
print("XLA inserted the halo exchanges and CG all-reduces automatically")

# --- The fused fast path (kernel-speed multi-chip) -------------------------
# A z-only mesh + aligned dims engage the shard_map fast path: ring-halo
# rolling kernels + the pencil-transpose distributed DST (strict=True
# raises instead of silently falling back).  Also available:
# poisson_method=Method.CG (ring-halo fused CG) and, standalone,
# cfd_tpu.parallel.fused_mg.make_multigrid_sharded (the O(N) option).
if len(devices) in (2, 4, 8):
    import jax.numpy as jnp

    zmesh = make_mesh(axes=("z",))
    gridf = Grid.uniform(128, 16, 2 * len(devices), zmin=0.0, zmax=1.0)
    stepf, placef = make_sharded_step(gridf, params, zmesh, "projection",
                                      use_pallas=True, strict=True,
                                      dtype=jnp.float32)
    ff = placef(FlowField.initialize(gridf, dtype=jnp.float32))
    for i in range(3):
        ff, resf = stepf(ff, 1e-3, i)
    assert bool(ff.is_finite())
    print(f"fused fast path: 3 steps, max|u| = {float(resf.max_velocity):.4f}"
          " (ring-halo kernels + distributed DST)")

# --- (z, y) 2D-mesh fused paths (pod scale) ---------------------------------
# When z-planes alone run out of chips, every integrator also runs fused
# on a 2D (z, y) mesh: global-row kernels + 4-row y-halo rings + the
# two-axis pencil DST (projection) — and the fused CG/BiCGSTAB/multigrid
# Poisson solvers shard the same way.
if len(devices) == 8:
    import jax.numpy as jnp
    from jax.sharding import Mesh

    zymesh = Mesh(np.array(devices).reshape(2, 4), ("z", "y"))
    gridzy = Grid.uniform(128, 32, 8, zmin=0.0, zmax=1.0)
    for method in ("projection", "explicit_euler", "rk2"):
        stepzy, placezy = make_sharded_step(gridzy, params, zymesh, method,
                                            use_pallas=True, strict=True,
                                            dtype=jnp.float32)
        fzy = placezy(FlowField.initialize(gridzy, dtype=jnp.float32))
        fzy, reszy = stepzy(fzy, 1e-4, 0)
        assert bool(fzy.is_finite())
        print(f"zy-mesh fused {method}: ok on mesh {dict(zymesh.shape)}")

# --- Facade-level multi-chip ------------------------------------------------
# The whole Simulation session (the reference's init_simulation /
# run_simulation_step / run_simulation_solve surface) takes a mesh too:
# where the reference selects a backend by solver-name suffix (_omp, _gpu),
# parallelism here is a placement argument.  Checkpoints stay
# placement-free bytes — save sharded, resume anywhere.
from cfd_tpu.api.simulation import Simulation

sim = Simulation.create(32, 32, 16, zmax=0.5, solver_type="projection",
                        mesh=mesh)
for _ in range(3):
    assert int(sim.step()) == 0
print(f"facade: 3 sharded steps, t = {sim.current_time:.3f}, "
      f"field on {len(sim.field.u.sharding.device_set)} devices")
