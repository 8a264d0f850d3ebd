"""Run-directory management.

Re-design of `lib/include/cfd/core/filesystem.h:26-94` /
`lib/src/core/filesystem.c:148-220`: portable directory creation and the
``{prefix}_{nx}x{ny}_{timestamp}`` run-directory naming scheme used by the
output registry.
"""

from __future__ import annotations

import os
import time


def ensure_directory_exists(path: str) -> bool:
    try:
        os.makedirs(path, exist_ok=True)
        return True
    except OSError:
        return False


def make_run_dir_name(prefix: str, nx: int, ny: int, timestamp: float = None) -> str:
    """``{prefix}_{nx}x{ny}_{YYYYmmdd_HHMMSS}`` (`filesystem.c:179-194`)."""
    ts = time.localtime(timestamp if timestamp is not None else time.time())
    stamp = time.strftime("%Y%m%d_%H%M%S", ts)
    return f"{prefix}_{nx}x{ny}_{stamp}"


def create_run_directory(base_dir: str, prefix: str, nx: int, ny: int) -> str:
    """Create ``{base}/output/{prefix}_{nx}x{ny}_{timestamp}/`` and return it."""
    out_root = os.path.join(base_dir, "output")
    run_dir = os.path.join(out_root, make_run_dir_name(prefix, nx, ny))
    ensure_directory_exists(run_dir)
    return run_dir
