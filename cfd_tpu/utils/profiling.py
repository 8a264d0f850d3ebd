"""Profiling and timing utilities.

The reference has no profiler beyond per-step wall-clock stats
(`navier_stokes_solver.h:198-207`, SURVEY.md §5); the TPU-native equivalent
adds the JAX profiler (trace files viewable in Perfetto/TensorBoard) and a
step timer that is honest about asynchronous dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synchronized_time(fn: Callable, *args, reps: int = 1,
                      force_fetch: bool = True):
    """Wall time of ``fn(*args)`` with real device synchronization.

    On tunneled platforms ``block_until_ready`` can return before device
    work completes; fetching a derived scalar is the only reliable barrier.
    Returns (seconds_per_rep, last_result).
    """
    result = fn(*args)
    _sync(result, force_fetch)
    t0 = time.perf_counter()
    for _ in range(reps):
        result = fn(*args)
    _sync(result, force_fetch)
    return (time.perf_counter() - t0) / reps, result


def _sync(result, force_fetch: bool):
    leaves = [l for l in jax.tree_util.tree_leaves(result)
              if hasattr(l, "block_until_ready")]
    if not leaves:
        return
    if force_fetch:
        leaf = leaves[0]
        float(jnp.sum(jnp.ravel(leaf)[:1]))
    else:
        leaves[0].block_until_ready()


class StepTimer:
    """Accumulates per-step wall times into reference-style statistics."""

    def __init__(self):
        self.count = 0
        self.total_s = 0.0
        self.min_s = float("inf")
        self.max_s = 0.0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_ms(self) -> float:
        return self.total_s / max(1, self.count) * 1e3

    def mlups(self, cells: int) -> float:
        """Cell-updates/second in millions — the reference's metric
        (`performance_comparison.c:61`)."""
        return cells * self.count / max(self.total_s, 1e-12) / 1e6

    def summary(self) -> str:
        return (f"{self.count} steps, mean {self.mean_ms:.2f} ms "
                f"(min {self.min_s * 1e3:.2f}, max {self.max_s * 1e3:.2f})")
