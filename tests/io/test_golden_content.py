"""Golden-content I/O tests: exact header lines and value formatting, the
analog of the reference's VTK/CSV content tests (`tests/io/`): downstream
tooling parses these files byte-by-byte, so the headers and column orders
are a compatibility contract (`vtk_output.c:127-130`, `csv_output.h:50-81`).
"""

import os

import jax.numpy as jnp
import numpy as np

from cfd_tpu import FlowField, Grid
from cfd_tpu.io.csv_out import (write_csv_centerline, write_csv_statistics,
                                write_csv_timeseries)
from cfd_tpu.io.vtk import write_vtk_flow_field, write_vtk_scalar


def _tiny():
    g = Grid.uniform(3, 4, xmin=0.0, xmax=1.0, ymin=0.0, ymax=3.0)
    f = FlowField.initialize(g)
    return g, f


def test_vtk_scalar_golden_header(tmp_path):
    g, f = _tiny()
    p = str(tmp_path / "s.vtk")
    write_vtk_scalar(p, "pressure", np.asarray(f.p)[0],
                     g.nx, g.ny, 1, g.xmin, g.xmax, g.ymin, g.ymax, 0.0, 0.0)
    lines = open(p).read().splitlines()
    assert lines[0] == "# vtk DataFile Version 3.0"
    assert lines[2] == "ASCII"
    assert lines[3] == "DATASET STRUCTURED_POINTS"
    assert lines[4] == "DIMENSIONS 3 4 1"
    assert lines[5].startswith("ORIGIN 0.000000 0.000000 0.000000")
    assert lines[6].startswith("SPACING 0.500000 1.000000 ")
    # POINT_DATA block
    assert "POINT_DATA 12" in lines
    i = lines.index("POINT_DATA 12")
    assert lines[i + 1] == "SCALARS pressure float 1"
    assert lines[i + 2] == "LOOKUP_TABLE default"
    # %f-formatted values, one per line, nx*ny of them
    values = lines[i + 3:]
    assert len([v for v in values if v]) == 12
    float(values[0])  # parses


def test_vtk_flow_field_blocks(tmp_path):
    g, f = _tiny()
    p = str(tmp_path / "ff.vtk")
    write_vtk_flow_field(p, f, g.nx, g.ny, 1,
                         g.xmin, g.xmax, g.ymin, g.ymax, 0.0, 0.0)
    txt = open(p).read()
    assert "VECTORS velocity float" in txt
    # scalar blocks in reference order
    iv = txt.index("VECTORS velocity float")
    ip = txt.index("SCALARS pressure float 1")
    ir = txt.index("SCALARS density float 1")
    it = txt.index("SCALARS temperature float 1")
    assert iv < ip < ir < it
    # velocity rows are triplets
    vec_line = txt[iv:].splitlines()[1]
    assert len(vec_line.split()) == 3


def test_csv_timeseries_golden_header_and_append(tmp_path):
    from cfd_tpu.core.derived import compute_statistics
    g, f = _tiny()
    stats = compute_statistics(f)
    p = str(tmp_path / "ts.csv")
    write_csv_timeseries(p, 0, 0.0, 0.005, stats, 7, 1e-3, 0.5,
                         create_new=True)
    write_csv_timeseries(p, 1, 0.005, 0.005, stats, 8, 1e-4, 0.4,
                         create_new=False)
    lines = open(p).read().splitlines()
    assert lines[0] == ("step,time,dt,max_u,max_v,max_w,max_p,"
                        "avg_u,avg_v,avg_w,avg_p,"
                        "max_vel_mag,avg_vel_mag,"
                        "iterations,residual,elapsed_ms")
    assert len(lines) == 3  # header + two appended rows
    row = lines[1].split(",")
    assert row[0] == "0" and row[13] == "7"
    # %.6e formatting (reference csv_output.c)
    assert "e" in row[1] and "e" in row[14]
    np.testing.assert_allclose(float(row[3]),
                               float(stats["u"].max_val), rtol=1e-5)


def test_csv_statistics_golden_header(tmp_path):
    g, f = _tiny()
    from cfd_tpu.core.derived import compute_statistics
    stats = compute_statistics(f)
    p = str(tmp_path / "st.csv")
    write_csv_statistics(p, 0, 0.0, stats, create_new=True)
    lines = open(p).read().splitlines()
    assert lines[0].startswith(
        "step,time,min_u,max_u,avg_u,min_v,max_v,avg_v,")
    assert len(lines) == 2
    vals = lines[1].split(",")
    assert len(vals) == len(lines[0].split(","))


def test_csv_centerline_x_direction(tmp_path):
    g, f = _tiny()
    p = str(tmp_path / "cl.csv")
    from cfd_tpu.io.csv_out import HORIZONTAL
    write_csv_centerline(p, f, np.asarray(g.x), np.asarray(g.y),
                         direction=HORIZONTAL)
    lines = open(p).read().splitlines()
    assert lines[0] == "x,u,v,w,p,rho,T"
    assert len(lines) == 1 + g.nx   # one row per x point
    first = lines[1].split(",")
    assert len(first) == 7
    np.testing.assert_allclose(float(first[0]), 0.0)


def test_deterministic_output(tmp_path):
    """Writing the same field twice produces byte-identical files (the
    native-vs-python identity itself is covered in test_native.py)."""
    g, f = _tiny()
    p1, p2 = str(tmp_path / "a.vtk"), str(tmp_path / "b.vtk")
    data = np.asarray(f.p)[0]
    for p in (p1, p2):
        write_vtk_scalar(p, "p", data, g.nx, g.ny, 1,
                         g.xmin, g.xmax, g.ymin, g.ymax, 0.0, 0.0)
    assert open(p1, "rb").read() == open(p2, "rb").read()
