"""Native I/O library tests: build, byte-compatibility with the Python
fallback, CRC32 agreement, and graceful degradation."""

import os
import zlib

import numpy as np
import pytest

from cfd_tpu import native
from cfd_tpu.io import vtk


def test_native_builds_and_loads():
    # The environment ships gcc; the library must build.
    assert native.native_available(), "native library failed to build"


def test_native_and_python_vtk_identical(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(1, 12, 17))

    p_native = str(tmp_path / "n.vtk")
    p_python = str(tmp_path / "p.vtk")
    vtk.write_vtk_scalar(p_native, "f", data, 17, 12, 1, 0, 1, 0, 1)

    # Force the Python fallback path.
    orig = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        vtk.write_vtk_scalar(p_python, "f", data, 17, 12, 1, 0, 1, 0, 1)
    finally:
        native._lib, native._tried = orig

    assert open(p_native).read() == open(p_python).read()


def test_native_vectors_match_python(tmp_path):
    rng = np.random.default_rng(1)
    u = rng.normal(size=(1, 6, 8))
    v = rng.normal(size=(1, 6, 8))
    w = rng.normal(size=(1, 6, 8))
    pn = str(tmp_path / "n.vtk")
    pp = str(tmp_path / "p.vtk")
    vtk.write_vtk_vector(pn, "vel", u, v, w, 8, 6, 1, 0, 1, 0, 1)
    orig = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        vtk.write_vtk_vector(pp, "vel", u, v, w, 8, 6, 1, 0, 1, 0, 1)
    finally:
        native._lib, native._tried = orig
    assert open(pn).read() == open(pp).read()


def test_native_crc32_matches_zlib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native lib")
    import ctypes
    data = os.urandom(4096)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    got = lib.cfd_crc32(0, buf, len(data))
    assert got == zlib.crc32(data)
    # incremental chaining
    mid = len(data) // 2
    buf1 = (ctypes.c_uint8 * mid).from_buffer_copy(data[:mid])
    buf2 = (ctypes.c_uint8 * (len(data) - mid)).from_buffer_copy(data[mid:])
    c1 = lib.cfd_crc32(0, buf1, mid)
    c2 = lib.cfd_crc32(c1, buf2, len(data) - mid)
    assert c2 == zlib.crc32(data)
