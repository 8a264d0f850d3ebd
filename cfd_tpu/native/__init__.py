"""Native (C) runtime components, loaded via ctypes with Python fallbacks.

The reference library implements its whole runtime in C11; in the TPU-native
re-design, XLA owns the compute path and only host-side hot loops justify
native code.  Currently: the VTK/CSV value-formatting loops (millions of
``%f`` conversions per snapshot) and a CRC32 helper.

The shared library is built on demand with the system compiler (cc) into the
package directory; every entry point degrades to pure Python when the
toolchain or binary is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "vtk_writer.c")
_BIN = os.path.join(os.path.dirname(__file__),
                    f"_cfd_native_{sys.platform}.so")


def _build() -> Optional[str]:
    if os.path.exists(_BIN) and os.path.getmtime(_BIN) >= os.path.getmtime(_SRC):
        return _BIN
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _BIN, _SRC],
                check=True, capture_output=True, timeout=120)
            return _BIN
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib():
    """The loaded native library, or None (fallback to Python)."""
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        try:
            path = _build()
            if path:
                lib = ctypes.CDLL(path)
                lib.cfd_fopen.restype = ctypes.c_void_p
                lib.cfd_fopen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
                lib.cfd_fclose.argtypes = [ctypes.c_void_p]
                lib.cfd_fputs.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
                lib.cfd_write_scalars_f.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
                lib.cfd_write_vectors_f.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_int64]
                lib.cfd_crc32.restype = ctypes.c_uint32
                lib.cfd_crc32.argtypes = [ctypes.c_uint32, ctypes.c_void_p,
                                          ctypes.c_int64]
                _lib = lib
        except Exception:
            _lib = None
        _tried = True
    return _lib


def native_available() -> bool:
    return get_lib() is not None


class NativeTextFile:
    """A FILE*-backed text sink for interleaving header writes (Python
    strings) with bulk native value formatting."""

    def __init__(self, path: str):
        self._lib = get_lib()
        if self._lib is None:
            raise OSError("native library unavailable")
        self._fp = self._lib.cfd_fopen(path.encode(), b"w")
        if not self._fp:
            raise OSError(f"cannot open {path}")

    def write(self, text: str) -> None:
        self._lib.cfd_fputs(self._fp, text.encode())

    def write_scalars(self, arr) -> None:
        import numpy as np
        a = np.ascontiguousarray(arr, dtype=np.float64)
        rc = self._lib.cfd_write_scalars_f(
            self._fp, a.ctypes.data_as(ctypes.c_void_p), a.size)
        if rc != 0:
            raise OSError("native scalar write failed")

    def write_vectors(self, u, v, w=None) -> None:
        import numpy as np
        ua = np.ascontiguousarray(u, dtype=np.float64).reshape(-1)
        va = np.ascontiguousarray(v, dtype=np.float64).reshape(-1)
        wp = None
        if w is not None:
            wa = np.ascontiguousarray(w, dtype=np.float64).reshape(-1)
            wp = wa.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.cfd_write_vectors_f(
            self._fp, ua.ctypes.data_as(ctypes.c_void_p),
            va.ctypes.data_as(ctypes.c_void_p), wp, ua.size)
        if rc != 0:
            raise OSError("native vector write failed")

    def close(self) -> None:
        if self._fp:
            self._lib.cfd_fclose(self._fp)
            self._fp = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
