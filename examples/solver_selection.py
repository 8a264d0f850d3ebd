"""Solver registry discovery and selection (port of
examples/solver_selection.c)."""

from cfd_tpu.api import Simulation, create_registry
from cfd_tpu.core.features import Backend, backend_get_name, \
    backend_is_available

reg = create_registry()
print(f"{len(reg.list())} registered solvers:")
for name in reg.list():
    print(f"  {name:32s} {reg.describe(name)}")

print("\nbackend availability:")
for b in Backend:
    print(f"  {backend_get_name(b):12s} {backend_is_available(b)}")

print("\nby backend:")
for b in (Backend.SCALAR, Backend.CUDA):
    print(f"  {backend_get_name(b)}: {reg.list_by_backend(b)}")

# Checked creation: rejects unavailable backends instead of failing later.
s = reg.create_checked("projection_gpu")
print(f"\ncreate_checked('projection_gpu') -> "
      f"{'ok' if s else 'unavailable on this platform'}")

sim = Simulation.create(24, 24, solver_type="rk4")
sim.step()
print(f"rk4 step ok, max|u| = {sim.get_stats().max_velocity:.4f}")
