"""Byte-level VTK parity against the reference C writers.

Compiles a harness (``write_vtk.c``) against the reference's
`src/io/vtk_output.c` and byte-compares its scalar, vector, and full-field
files with `cfd_tpu.io.vtk` output from identical data — the format-parity
claim ("identical headers, column orders, %f formatting") proven against
the actual C implementation rather than asserted.

Skips when the reference tree or a C compiler is unavailable.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from cfd_tpu.io.vtk import (write_vtk_flow_field, write_vtk_scalar,
                            write_vtk_vector)

REF = pathlib.Path("/root/reference/lib")
HERE = pathlib.Path(__file__).parent

NX, NY, NZ = 7, 5, 3

_REF_SOURCES = [
    "src/io/vtk_output.c",
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
def ref_vtk_files(tmp_path_factory):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler available")
    if not (REF / "src/io/vtk_output.c").exists():
        pytest.skip("reference tree not mounted at /root/reference")

    build = tmp_path_factory.mktemp("vtkbuild")
    shim = build / "shim" / "cfd"
    shim.mkdir(parents=True)
    (shim / "cfd_export.h").write_text("#define CFD_LIBRARY_EXPORT\n")

    out = build / "write_vtk"
    cmd = [str(cc), "-O1", f"-I{build / 'shim'}", f"-I{REF / 'include'}",
           "-o", str(out), str(HERE / "write_vtk.c"),
           *[str(REF / s) for s in _REF_SOURCES], "-lm"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference harness build failed: {proc.stderr[:400]}")

    d = tmp_path_factory.mktemp("refvtk")
    files = [d / "scalar.vtk", d / "vector.vtk", d / "field.vtk"]
    proc = subprocess.run([str(out), *(str(f) for f in files)],
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return files


def _data():
    """Must match write_vtk.c::val exactly."""
    k, j, i = np.meshgrid(np.arange(NZ), np.arange(NY), np.arange(NX),
                          indexing="ij")
    base = 1.0 * i + 10.0 * j + 100.0 * k - 3.5
    return base, base + 0.25, base + 0.5


def test_scalar_vtk_bytes_match(ref_vtk_files, tmp_path):
    a, _, _ = _data()
    ours = tmp_path / "scalar.vtk"
    write_vtk_scalar(str(ours), "pressure", a, NX, NY, NZ,
                     0.0, 2.0, 0.0, 1.0, 0.0, 0.5)
    assert ours.read_bytes() == ref_vtk_files[0].read_bytes()


def test_vector_vtk_bytes_match(ref_vtk_files, tmp_path):
    a, b, c = _data()
    ours = tmp_path / "vector.vtk"
    write_vtk_vector(str(ours), "velocity", a, b, c, NX, NY, NZ,
                     0.0, 2.0, 0.0, 1.0, 0.0, 0.5)
    assert ours.read_bytes() == ref_vtk_files[1].read_bytes()


def test_flow_field_vtk_bytes_match(ref_vtk_files, tmp_path):
    a, b, c = _data()

    class F:
        u, v, w = a, b, c
        p = a * 2.0
        rho = 1.0 + 0.01 * b
        T = 300.0 + c

    ours = tmp_path / "field.vtk"
    write_vtk_flow_field(str(ours), F, NX, NY, NZ,
                         0.0, 2.0, 0.0, 1.0, 0.0, 0.5)
    assert ours.read_bytes() == ref_vtk_files[2].read_bytes()
