"""Leveled, component-tagged logging with callback hooks.

Re-design of the reference logging subsystem (`lib/include/cfd/core/logging.h:
21-92`, `lib/src/core/logging.c:13-110`): a global atomic level, component
tags, a simple callback hook and an extended callback hook that also receives
the component.  Python's GIL gives us the atomicity the C code got from
C11 atomics.
"""

from __future__ import annotations

import enum
import sys
import threading
import time as _time
from typing import Callable, Optional


class LogLevel(enum.IntEnum):
    DEBUG = 0
    INFO = 1
    WARNING = 2
    ERROR = 3
    NONE = 4


_lock = threading.Lock()
_level = LogLevel.WARNING
_callback: Optional[Callable[[int, str], None]] = None
_callback_ex: Optional[Callable[[int, str, str], None]] = None

_LEVEL_NAMES = {
    LogLevel.DEBUG: "DEBUG",
    LogLevel.INFO: "INFO",
    LogLevel.WARNING: "WARNING",
    LogLevel.ERROR: "ERROR",
}


def set_log_level(level: LogLevel) -> None:
    global _level
    _level = LogLevel(level)


def get_log_level() -> LogLevel:
    return _level


def set_log_callback(cb: Optional[Callable[[int, str], None]]) -> None:
    """Simple hook: cb(level, message). None restores stderr output."""
    global _callback
    with _lock:
        _callback = cb


def set_log_callback_ex(cb: Optional[Callable[[int, str, str], None]]) -> None:
    """Extended hook: cb(level, component, message)."""
    global _callback_ex
    with _lock:
        _callback_ex = cb


def log(level: LogLevel, component: str, message: str, *args) -> None:
    if level < _level:
        return
    if args:
        message = message % args
    cb_ex, cb = _callback_ex, _callback
    if cb_ex is not None:
        cb_ex(int(level), component, message)
        return
    if cb is not None:
        cb(int(level), f"[{component}] {message}")
        return
    stamp = _time.strftime("%H:%M:%S")
    print(f"{stamp} [{_LEVEL_NAMES.get(level, '?')}] [{component}] {message}",
          file=sys.stderr)


def debug(component: str, message: str, *args) -> None:
    log(LogLevel.DEBUG, component, message, *args)


def info(component: str, message: str, *args) -> None:
    log(LogLevel.INFO, component, message, *args)


def warning(component: str, message: str, *args) -> None:
    log(LogLevel.WARNING, component, message, *args)


def error(component: str, message: str, *args) -> None:
    log(LogLevel.ERROR, component, message, *args)
