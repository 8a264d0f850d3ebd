"""Ghia lid-driven cavity validation (Re=100 CI tier; Re=400/1000 full tier).

Mirrors tests/validation/test_ghia_{projection,euler}_cpu.c with the same
acceptance bars: projection RMS < 0.10, explicit Euler RMS < 0.15 on 33×33
(`lid_driven_cavity_common.h:28-58`, `test_cavity_backends.c:38-50`).
"""

import numpy as np
import pytest

from . import ghia_data
from .harness import centerline_profiles, run_cavity


def cavity_rms(method, nx, steps, dt, re):
    field, grid, statuses = run_cavity(method, nx, steps, dt, re)
    assert (statuses == 0).all(), "solver failed mid-run"
    (y, u_prof), (x, v_prof) = centerline_profiles(field, grid)
    rms_u = ghia_data.profile_rms_error(y, u_prof, ghia_data.Y_COORDS,
                                        ghia_data.U_TABLES[re])
    rms_v = ghia_data.profile_rms_error(x, v_prof, ghia_data.X_COORDS,
                                        ghia_data.V_TABLES[re])
    return rms_u, rms_v, field


def test_ghia_re100_projection():
    rms_u, rms_v, field = cavity_rms("projection", 33, 3000, 5e-4, 100)
    assert rms_u < 0.10, f"u-centerline RMS {rms_u:.4f} >= 0.10"
    assert rms_v < 0.10, f"v-centerline RMS {rms_v:.4f} >= 0.10"


def test_ghia_re100_euler():
    # Euler's internal dt cap (1e-4) needs 5x the steps
    # (`lid_driven_cavity_common.h:53-58`).
    rms_u, rms_v, _ = cavity_rms("explicit_euler", 33, 10000, 5e-4, 100)
    assert rms_u < 0.15, f"u-centerline RMS {rms_u:.4f} >= 0.15"
    assert rms_v < 0.15, f"v-centerline RMS {rms_v:.4f} >= 0.15"


# Note: the RK2/RK4 integrators apply periodic BCs to the final state each
# step (`solver_rk2.c` "Apply BCs to final state only"), overwriting wall
# BCs — the reference accordingly validates only euler/projection on the
# cavity (test_ghia_{euler,projection}_*.c); RK solvers are validated on the
# periodic Taylor-Green problem instead.


def test_cavity_physical_sanity():
    """Flow structure checks: primary vortex rotation, velocity bounds."""
    _, _, field = cavity_rms("projection", 33, 2000, 5e-4, 100)
    u = np.asarray(field.u)[0]
    v = np.asarray(field.v)[0]
    # velocities bounded by lid speed (with small overshoot tolerance)
    assert np.abs(u).max() <= 1.05
    assert np.abs(v).max() <= 1.05
    # u near the lid follows the lid; u in the lower half counter-flows
    assert u[-2, 16] > 0.3
    assert u[8, 16] < 0.0


def test_ghia_re400_projection_full(full_validation):
    if not full_validation:
        pytest.skip("full-validation tier (--full-validation)")
    # Grid-limited bar, not the reference's loose 0.10 (suite standard:
    # assert what was measured).  65², dt=5e-4: t=10 is still
    # transient-dominated (0.069/0.085); measured steady values are
    # t=20 → 0.0324/0.0440, t=30 → 0.0273/0.0395.  t=20 with a ~25%
    # margin pins the level while keeping the tier's runtime in check.
    rms_u, rms_v, _ = cavity_rms("projection", 65, 40000, 5e-4, 400)
    assert rms_u < 0.040, f"u-centerline RMS {rms_u:.4f} >= 0.040"
    assert rms_v < 0.055, f"v-centerline RMS {rms_v:.4f} >= 0.055"


def test_ghia_re1000_projection_full(full_validation):
    if not full_validation:
        pytest.skip("full-validation tier (--full-validation)")
    # Re=1000 needs t≈30 to reach steady state (t=10 leaves RMS≈0.14);
    # dt=5e-4 is comfortably inside both the CFL (0.064) and diffusive
    # (dx²/4ν≈0.015) limits at 129². Measured: rms_u=0.036 at t=30 —
    # grid-limited (129² discretization error).  The 1% north-star bar is
    # demonstrated on-chip at finer grids by bench.py's ghia_re1000 gate
    # (513², t=60 → RMS 0.0038/0.0041; artifacts/ghia1000_sweep.py sweep:
    # 257²→0.0099, 385²→0.0058); this CPU-tier test pins the 129² level.
    rms_u, rms_v, _ = cavity_rms("projection", 129, 60000, 5e-4, 1000)
    assert rms_u < 0.05
    assert rms_v < 0.05
