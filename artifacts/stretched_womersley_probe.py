"""Probe: Womersley (alpha=3) profile error on tanh-y wall-clustered grids,
reference-parity vs consistent nonuniform derivative scheme.

This is the measured basis for ``NSParams(nonuniform_scheme="consistent")``
(see CLAUDE.md and docs/design.md): the reference's forward-spacing parity
stencils (`/root/reference/lib/src/solvers/navier_stokes/cpu/
solver_explicit_euler.c` uses dx[i] one-sided spacings as if uniform) leave
10-30% profile error on beta=1-2 stretched grids, while the exact 3-point
nonuniform weights recover ~1% — uniform-grid accuracy at equal ny.

The sweep drives the SAME harness the regression test asserts against
(`tests/validation/test_pulsatile_channel.py::
test_womersley_stretched_consistent_vs_parity`), so this probe and the
committed evidence cannot drift apart.

Run (CPU is fine; ~2-4 min per cell):
    python artifacts/stretched_womersley_probe.py

Measured 2026-08-19 (CPU f64, ny=17, nx=8, alpha=3, 3 cycles, dt=1e-4):

    beta   parity    consistent
    0.0    0.0115    0.0115      (uniform grid: schemes coincide)
    1.0    0.0450    0.0072
    1.5    0.1825    0.0116
    2.0    0.4544    0.0252

parity error GROWS with clustering strength (the stencil's effective
truncation term is O(dy_{i+1}-dy_i) ~ O(beta^2 h)); consistent stays at the
uniform-grid floor until beta=2's near-wall cells get CFL/resolution-limited.
"""
import os
import sys
from pathlib import Path

# Same CPU/x64 setup as tests/conftest.py (must precede the jax import).
os.environ.pop("JAX_PLATFORMS", None)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Reuse the regression-test harness verbatim (single source of truth).
from validation.test_pulsatile_channel import _run_womersley_euler  # noqa: E402


def main():
    alpha = 3.0
    print(f"{'beta':>5} {'parity':>10} {'consistent':>12}")
    for beta in (0.0, 1.0, 1.5, 2.0):
        errs = {}
        for scheme in ("parity", "consistent"):
            errs[scheme] = _run_womersley_euler(alpha, beta, scheme)
        print(f"{beta:5.1f} {errs['parity']:10.4f} {errs['consistent']:12.4f}",
              flush=True)


if __name__ == "__main__":
    main()
