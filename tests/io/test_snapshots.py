"""Native (orbax-style) snapshot tests."""

import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary import BCType, DirichletValues, ThermalBCConfig
from cfd_tpu.core.status import CFDError
from cfd_tpu.io import orbax_ckpt
from cfd_tpu.solvers.ns import NSParams


def test_snapshot_roundtrip(tmp_path):
    g = Grid.uniform(12, 10, xmin=0, xmax=2, ymin=0, ymax=1)
    f = FlowField.initialize(g)
    p = NSParams(mu=0.03, alpha=0.2, gravity=(0.0, -9.81, 0.0),
                 thermal_bc=ThermalBCConfig(
                     left=BCType.DIRICHLET,
                     dirichlet_values=DirichletValues(left=310.0)))
    path = str(tmp_path / "snap")
    orbax_ckpt.save_snapshot(path, g, f, p, 2.5, "projection")
    g2, f2, p2, t, name = orbax_ckpt.load_snapshot(path)
    assert t == 2.5 and name == "projection"
    assert (g2.nx, g2.ny, g2.nz) == (12, 10, 1)
    np.testing.assert_allclose(np.asarray(g2.x), np.asarray(g.x))
    for k in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(f2, k)),
                                   np.asarray(getattr(f, k)), rtol=1e-6)
    assert p2.mu == p.mu and p2.alpha == p.alpha
    assert p2.thermal_bc.left == BCType.DIRICHLET
    assert p2.thermal_bc.dirichlet_values.left == 310.0


def test_snapshot_stretched_grid(tmp_path):
    g = Grid.stretched(9, 9, 9, zmin=0, zmax=1, beta=1.5)
    f = FlowField.quiescent(9, 9, 9)
    path = str(tmp_path / "snap")
    orbax_ckpt.save_snapshot(path, g, f, NSParams(), 0.0, "rk4")
    g2, *_ = orbax_ckpt.load_snapshot(path)
    np.testing.assert_allclose(np.asarray(g2.z), np.asarray(g.z))
    np.testing.assert_allclose(g2.inv_dz2, g.inv_dz2)


def test_snapshot_missing_rejected(tmp_path):
    with pytest.raises(CFDError):
        orbax_ckpt.load_snapshot(str(tmp_path / "nope"))
