"""Byte-level CSV parity against the reference C writers.

Compiles a harness (``write_csv.c``) against the reference's
`src/io/csv_output.c` and byte-compares timeseries (with append),
horizontal/vertical centerline, and statistics files against
`cfd_tpu.io.csv_out` output from identical data.

Skips when the reference tree or a C compiler is unavailable.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.core.derived import compute_statistics, velocity_magnitude
from cfd_tpu.core.field import FlowField
from cfd_tpu.io.csv_out import (HORIZONTAL, VERTICAL, write_csv_centerline,
                                write_csv_statistics, write_csv_timeseries)

REF = pathlib.Path("/root/reference/lib")
HERE = pathlib.Path(__file__).parent

NX, NY = 9, 6

_REF_SOURCES = [
    "src/io/csv_output.c",
    "src/core/filesystem.c",
    "src/core/grid.c",
    "src/core/memory.c",
    "src/core/logging.c",
    "src/core/cfd_init.c",
    "src/core/math_utils.c",
    "src/core/derived_fields.c",
    "src/solvers/navier_stokes/cpu/solver_explicit_euler.c",
    "src/solvers/energy/cpu/energy_solver.c",
]


@pytest.fixture(scope="module")
def ref_csv_files(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler available")
    if not (REF / "src/io/csv_output.c").exists():
        pytest.skip("reference tree not mounted at /root/reference")

    build = tmp_path_factory.mktemp("csvbuild")
    shim = build / "shim" / "cfd"
    shim.mkdir(parents=True)
    (shim / "cfd_export.h").write_text("#define CFD_LIBRARY_EXPORT\n")

    out = build / "write_csv"
    cmd = [str(cc), "-O1", f"-I{build / 'shim'}", f"-I{REF / 'include'}",
           "-o", str(out), str(HERE / "write_csv.c"),
           *[str(REF / s) for s in _REF_SOURCES], "-lm"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference harness build failed: {proc.stderr[:400]}")

    d = tmp_path_factory.mktemp("refcsv")
    files = [d / "ts.csv", d / "cl_h.csv", d / "cl_v.csv", d / "st.csv"]
    proc = subprocess.run([str(out), *(str(f) for f in files)],
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return files


def _state():
    """Must match write_csv.c::val exactly."""
    j, i = np.meshgrid(np.arange(NY), np.arange(NX), indexing="ij")

    def val(which):
        return (0.125 * which + 0.5 * i - 0.25 * j + 0.0625)[None]

    f = FlowField(u=jnp.asarray(val(0)), v=jnp.asarray(val(1)),
                  w=jnp.zeros((1, NY, NX)),
                  p=jnp.asarray(val(2)),
                  rho=jnp.asarray(1.0 + 0.001 * val(3)),
                  T=jnp.asarray(300.0 + val(4)))
    return f, compute_statistics(f)


def test_timeseries_bytes_match(ref_csv_files, tmp_path):
    f, stats = _state()
    ours = tmp_path / "ts.csv"
    write_csv_timeseries(str(ours), 0, 0.0, 0.0025, stats, 42, 3.5e-4,
                         1.75, create_new=True)
    write_csv_timeseries(str(ours), 1, 0.0025, 0.0025, stats, 43, 3.5e-4,
                         1.75, create_new=False)
    assert ours.read_bytes() == ref_csv_files[0].read_bytes()


@pytest.mark.parametrize("direction,idx", [(HORIZONTAL, 1), (VERTICAL, 2)])
def test_centerline_bytes_match(ref_csv_files, tmp_path, direction, idx):
    f, _ = _state()
    x = np.linspace(0.0, 2.0, NX)
    y = np.linspace(0.0, 1.0, NY)
    ours = tmp_path / "cl.csv"
    write_csv_centerline(str(ours), f, x, y, direction=direction,
                         vel_mag=velocity_magnitude(f))
    assert ours.read_bytes() == ref_csv_files[idx].read_bytes()


def test_statistics_bytes_match(ref_csv_files, tmp_path):
    f, stats = _state()
    ours = tmp_path / "st.csv"
    write_csv_statistics(str(ours), 0, 0.0, stats, create_new=True)
    write_csv_statistics(str(ours), 5, 0.0125, stats, create_new=False)
    assert ours.read_bytes() == ref_csv_files[3].read_bytes()
