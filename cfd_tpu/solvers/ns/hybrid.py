"""Hybrid differentiable steps: fused Pallas forward, jnp adjoint.

Extension component — the C reference is forward-only.  The fused Mosaic
kernels (ops/pallas/{euler,rk,projection}_kernels) have no reverse rule:
Pallas ``pallas_call`` supports custom-VJP wrapping but not automatic
transposition of the in-kernel control flow.  Rather than hand-derive and
maintain transpose kernels, ``pair_vjp`` glues a step's fused forward to
the XLA-generated adjoint of its jnp twin:

* **value**: the fused kernel (full kernel throughput for inference /
  loss evaluation inside a differentiable rollout);
* **reverse derivative**: ``jax.vjp`` of the jnp step, re-linearized at
  the saved inputs during the backward sweep (one extra jnp forward per
  step — the same recompute schedule ``remat="step"`` already implies).

For Euler/RK the fused kernels are bit-identical to the jnp path on TPU
(TPUVAL_r03), so the pairing is exact: gradient of the function actually
evaluated.  For the projection step the fused forward differs from the
jnp forward at solver-tolerance level (~1e-8 RMS), so the gradient is the
linearization of the tolerance-equal jnp step — the standard
inexact-primal/exact-adjoint trade of adjoint CFD.

The wrapped step is reverse-mode only (``jax.custom_vjp`` blocks
forward-mode ``jvp``); use the plain jnp step for ``jax.jacfwd``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _zero_cotangent(x):
    """Cotangent for a non-differentiable primal: float0 for int/bool
    dtypes (JAX's symbolic zero), real zeros otherwise."""
    x = jnp.asarray(x)
    if (jnp.issubdtype(x.dtype, jnp.integer)
            or jnp.issubdtype(x.dtype, jnp.bool_)):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


def pair_vjp(primal_step, adjoint_step):
    """Build a ``(field, dt, iter_idx) -> (field, StepResult)`` step whose
    value is ``primal_step``'s and whose reverse-mode derivative is the
    linearization of ``adjoint_step`` at the inputs.

    Both arguments follow the ``make_*_step`` contract.  ``iter_idx`` is
    treated as non-differentiable (it indexes source decay / time, both
    reachable through ``dt`` instead)."""

    @jax.custom_vjp
    def step(field, dt, iter_idx):
        return primal_step(field, dt, iter_idx)

    def fwd(field, dt, iter_idx):
        return primal_step(field, dt, iter_idx), (field, dt, iter_idx)

    def bwd(residuals, cotangent):
        field, dt, iter_idx = residuals
        _, vjp = jax.vjp(lambda f, d: adjoint_step(f, d, iter_idx),
                         field, dt)
        d_field, d_dt = vjp(cotangent)
        return d_field, d_dt, _zero_cotangent(iter_idx)

    step.defvjp(fwd, bwd)
    return step
