"""Global configuration for cfd_tpu.

The reference library (shaia/CFD) is float64 everywhere. On TPU, float64 is
emulated and slow, so cfd_tpu makes precision a *policy*:

* On CPU (tests, validation) the default dtype is float64 when JAX x64 mode is
  enabled, matching the reference's numerics bit-for-tolerance.
* On TPU the default is float32; the validation suite re-checks the physics
  gates (Ghia / Taylor-Green / de Vahl Davis) at this precision.

Every constructor in the library accepts ``dtype=None`` which resolves through
:func:`default_dtype`.

Reference: precision risk discussed in SURVEY.md §7 ("f64 on TPU").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_default_dtype = None  # resolved lazily; see default_dtype()


def set_default_dtype(dtype) -> None:
    """Set the library-wide default floating dtype (None = auto-resolve)."""
    global _default_dtype
    _default_dtype = None if dtype is None else jnp.dtype(dtype)


def default_dtype():
    """Resolve the default dtype.

    Explicit setting wins; otherwise float64 iff JAX x64 mode is enabled
    (typical for CPU test runs), else float32 (typical for TPU runs).
    """
    if _default_dtype is not None:
        return _default_dtype
    if jax.config.jax_enable_x64:
        return jnp.dtype(jnp.float64)
    return jnp.dtype(jnp.float32)


def resolve_dtype(dtype=None):
    return default_dtype() if dtype is None else jnp.dtype(dtype)
