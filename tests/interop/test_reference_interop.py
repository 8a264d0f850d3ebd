"""Cross-implementation checkpoint interop against the reference C library.

Compiles two tiny C harnesses (``write_ckpt.c`` / ``read_ckpt.c``) directly
against the reference sources (``src/io/checkpoint.c`` + its deps) and checks

* a checkpoint written by the **reference library** loads through
  :func:`cfd_tpu.io.checkpoint.read_checkpoint` with every grid dimension,
  field value, solver parameter, and metadata string intact; and
* a checkpoint written by :func:`cfd_tpu.io.checkpoint.write_checkpoint` is
  accepted by the **reference reader** (`src/io/checkpoint.c:cfd_checkpoint_read`)
  producing an identical digest — i.e. our ``.cfdchk`` codec is byte-level
  compatible in both directions (the only bytes that may differ are the
  informational writer-version u16s in the header and the trailing CRC that
  covers them).

Skips when the reference tree or a C compiler is unavailable.
"""

from __future__ import annotations

import dataclasses
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from cfd_tpu.boundary import BCType
from cfd_tpu.core.field import FlowField
from cfd_tpu.core.grid import Grid
from cfd_tpu.io.checkpoint import read_checkpoint, write_checkpoint
from cfd_tpu.solvers.ns.params import NSParams

REF = pathlib.Path("/root/reference/lib")
HERE = pathlib.Path(__file__).parent

# The reference checkpoint codec and the pieces it links against.
_REF_SOURCES = [
    "src/io/checkpoint.c",
    "src/core/grid.c",
    "src/core/memory.c",
    "src/core/logging.c",
    "src/core/cfd_init.c",
    "src/core/math_utils.c",
    "src/solvers/navier_stokes/cpu/solver_explicit_euler.c",
    "src/solvers/energy/cpu/energy_solver.c",
]

# Digest tokens the reference reader must print for the canonical state
# (8x6x1 grid on [0,2]x[0,1], initialize_flow_field data, t=1.25).
_EXPECTED_DIGEST = {
    "nx=8", "ny=6", "nz=1", "t=1.250000", "solver=projection",
    "prefix=runpfx", "dt=0.002000", "mu=0.050000", "alpha=0.100000",
    "beta=0.010000", "tbc_left=2", "tbc_lv=350.0",
    "usum=50.4621468297", "Tsum=14400.0000000000",
}


@pytest.fixture(scope="module")
def ref_tools(tmp_path_factory):
    """Compile the reference write/read harnesses; skip if impossible."""
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler available")
    if not (REF / "src/io/checkpoint.c").exists():
        pytest.skip("reference tree not mounted at /root/reference")

    build = tmp_path_factory.mktemp("refbuild")
    # The reference's CMake generates cfd/cfd_export.h; shim it for a
    # plain static compile.
    shim = build / "shim" / "cfd"
    shim.mkdir(parents=True)
    (shim / "cfd_export.h").write_text("#define CFD_LIBRARY_EXPORT\n")

    sources = [str(REF / s) for s in _REF_SOURCES]
    tools = {}
    for name in ("write_ckpt", "read_ckpt"):
        out = build / name
        cmd = [cc, "-O1", f"-I{build / 'shim'}", f"-I{REF / 'include'}",
               "-o", str(out), str(HERE / f"{name}.c"), *sources, "-lm"]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            pytest.skip(f"reference harness build failed: {proc.stderr[:400]}")
        tools[name] = out
    return tools


@pytest.fixture(scope="module")
def ref_written(ref_tools, tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "ref_written.cfdchk"
    proc = subprocess.run([str(ref_tools["write_ckpt"]), str(path)],
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return path


def _canonical_state():
    """The same state write_ckpt.c builds, via the cfd_tpu API."""
    grid = Grid.uniform(8, 6, 1, 0.0, 2.0, 0.0, 1.0, 0.0, 0.0)
    field = FlowField.initialize(grid, dtype=np.float64)
    params = NSParams(dt=0.002, mu=0.05, alpha=0.1, beta=0.01, T_ref=300.0,
                      gravity=(0.0, -9.81, 0.0))
    tbc = dataclasses.replace(
        params.thermal_bc, left=BCType.DIRICHLET,
        dirichlet_values=dataclasses.replace(
            params.thermal_bc.dirichlet_values, left=350.0))
    return grid, field, params.replace(thermal_bc=tbc)


def test_read_reference_written_checkpoint(ref_written):
    """A checkpoint from the C library loads losslessly through our codec."""
    g, f, p, t, name, pfx, base = read_checkpoint(str(ref_written))

    assert (g.nx, g.ny, g.nz) == (8, 6, 1)
    assert (g.xmin, g.xmax, g.ymin, g.ymax) == (0.0, 2.0, 0.0, 1.0)
    assert t == 1.25
    assert (name, pfx, base) == ("projection", "runpfx", "/tmp/base")
    assert (p.dt, p.mu, p.alpha, p.beta) == (0.002, 0.05, 0.1, 0.01)
    assert p.gravity[1] == -9.81
    assert p.thermal_bc.left == BCType.DIRICHLET
    assert p.thermal_bc.dirichlet_values.left == 350.0

    # Field digests from the reference's own reader (read_ckpt.c output).
    assert abs(float(np.asarray(f.u).sum()) - 50.4621468297) < 1e-9
    assert float(np.asarray(f.T).sum()) == pytest.approx(14400.0, abs=1e-9)

    # And the fields must match initialize_flow_field() up to libm-vs-numpy
    # transcendental rounding (ULP-level).
    _, expect, _ = _canonical_state()
    for attr in ("u", "v", "w", "p", "rho", "T"):
        np.testing.assert_allclose(np.asarray(getattr(f, attr)),
                                   np.asarray(getattr(expect, attr)),
                                   rtol=0, atol=1e-14)


def test_reference_reads_our_checkpoint(ref_tools, ref_written, tmp_path):
    """The reference C reader accepts a cfd_tpu-written checkpoint.

    The state is loaded from the reference-written file and re-written with
    our codec, so the payload must round-trip byte-for-byte.
    """
    grid, field, params, t, name, pfx, base = read_checkpoint(
        str(ref_written))
    ours = tmp_path / "py_written.cfdchk"
    write_checkpoint(str(ours), grid, field, params, t, name, pfx, base)

    proc = subprocess.run([str(ref_tools["read_ckpt"]), str(ours)],
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    tokens = set(proc.stdout.split())
    missing = _EXPECTED_DIGEST - {t for t in tokens
                                  for t in [t.strip()]}
    assert not missing, f"digest mismatch, missing {missing}: {proc.stdout}"

    # Both readers agree byte-for-byte on every payload section: the files
    # differ only in the writer-version u16s (header bytes 16..21) and the
    # trailing CRC32 that covers them.
    a = ref_written.read_bytes()
    b = ours.read_bytes()
    assert len(a) == len(b)
    diff = [i for i in range(len(a)) if a[i] != b[i]]
    assert all(16 <= i < 22 or i >= len(a) - 4 for i in diff), diff
