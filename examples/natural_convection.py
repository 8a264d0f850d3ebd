"""Differentially heated cavity (de Vahl Davis) with Boussinesq coupling.

Port of the thermal workflow exercised by tests/validation/
test_natural_convection.c as a user-facing example.
"""

import sys
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.validation.test_natural_convection import run_dvd  # noqa: E402

umax, vmax, nu_avg, converged, steps, field = run_dvd(
    Ra=1e3, n=41, dt=0.002, max_steps=10000)
print(f"de Vahl Davis Ra=1e3 ({'converged' if converged else 'cap hit'} "
      f"after {steps} steps):")
print(f"  u_max* = {umax:7.3f}   (benchmark 3.649)")
print(f"  v_max* = {vmax:7.3f}   (benchmark 3.697)")
print(f"  Nu_avg = {nu_avg:7.3f}   (benchmark 1.117)")
