"""Derived fields: velocity magnitude and per-field statistics.

Re-design of `lib/include/cfd/core/derived_fields.h:27-71` and
`lib/include/cfd/core/field_ops.h:30-44`.  The C struct of lazily-computed
buffers becomes a pair of jitted functions returning pytrees; outputs cache
them per step exactly like the reference's ``simulation_write_outputs`` does
(`simulation_api.c:574-592`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from .field import FlowField


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FieldStats:
    """min/max/avg of one field (mirrors field_stats_t)."""

    min_val: jax.Array
    max_val: jax.Array
    avg_val: jax.Array


def velocity_magnitude(field: FlowField) -> jax.Array:
    """|u| = sqrt(u² + v² + w²)  (`field_ops.h:30-37`)."""
    return jnp.sqrt(field.u ** 2 + field.v ** 2 + field.w ** 2)


def velocity_magnitude_squared(field: FlowField) -> jax.Array:
    return field.u ** 2 + field.v ** 2 + field.w ** 2


def field_statistics(a: jax.Array) -> FieldStats:
    """min/max/avg over all points (`derived_fields.c:38-70`)."""
    return FieldStats(min_val=jnp.min(a), max_val=jnp.max(a), avg_val=jnp.mean(a))


@jax.jit
def compute_statistics(field: FlowField) -> Dict[str, FieldStats]:
    """Statistics for every flow variable plus velocity magnitude
    (`derived_fields.c:72-130`)."""
    vm = velocity_magnitude(field)
    return {
        "u": field_statistics(field.u),
        "v": field_statistics(field.v),
        "w": field_statistics(field.w),
        "p": field_statistics(field.p),
        "rho": field_statistics(field.rho),
        "T": field_statistics(field.T),
        "vel_mag": field_statistics(vm),
    }
