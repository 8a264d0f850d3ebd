"""Differentiable multi-step rollouts with rematerialization policies.

Extension component — the C reference has no adjoint capability; its only
multi-step driver is the forward-only iterate loop
(`run_simulation_solve`, `simulation_api.c:204-219`).  Here a rollout is a
``lax.scan`` over any step closure built by the `make_*_step` factories
(Euler/RK are differentiable as-is on the jnp path; projection needs
``differentiable=True`` for the adjoint pressure solve), so
``jax.grad(loss ∘ rollout)`` works end-to-end.

Reverse-mode memory is the binding constraint on TPU (HBM, not FLOPs): a
plain scan saves every step's intermediate arrays for the backward pass —
O(n_steps) of per-step internals (tens of stencil temporaries each; at
256³ f32 that is >1 GB per step).  The ``remat`` policies trade recompute
for memory:

========  ========================  =============================
policy    backward-pass memory      extra forward cost
========  ========================  =============================
None      O(n · internals)          0 — fastest, short rollouts
"step"    O(n · carry)              one step re-eval per step
"sqrt"    O(√n · carry + 1 chunk)   one step re-eval per step
========  ========================  =============================

``"step"`` wraps each step in `jax.checkpoint`: only the per-step carry
(the 6-field FlowField) is saved; the step's internals are recomputed
during the backward sweep.  ``"sqrt"`` additionally chunks the scan
√n-wise and checkpoints whole chunks, so even the per-step carries inside
a chunk are recomputed from the chunk boundary — the classical O(√n)
checkpointing schedule, the right default for long-horizon optimization
(10³–10⁵ steps).  All policies compute identical values; gradients agree
to the last ulp ("sqrt"'s nested scan can reassociate reductions —
tests/solvers/test_diff_rollout.py).  They differ only in the
memory/recompute schedule.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...core.field import FlowField

REMAT_POLICIES = (None, "none", "step", "sqrt")


def make_rollout(step, n_steps: int, *, remat=None, collect_results=False,
                 start_iter: int = 0):
    """Build ``rollout(field, dt) -> (field_n, results)``.

    ``step`` is any ``(field, dt, iter_idx) -> (field, StepResult)``
    closure.  ``dt`` may be a scalar (uniform) or an ``(n_steps,)`` array
    (per-step — e.g. an optimizable schedule; gradients flow through it
    either way).  ``results`` is the stacked per-step StepResults when
    ``collect_results=True`` (cheap — StepResult is six scalars), else
    the final step's StepResult only.
    """
    if remat not in REMAT_POLICIES:
        raise ValueError(f"remat must be one of {REMAT_POLICIES}")
    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    remat = None if remat == "none" else remat

    def body(carry, i):
        field, dt = carry
        dt_i = dt if jnp.ndim(dt) == 0 else dt[i - start_iter]
        new_field, res = step(field, dt_i, i)
        return (new_field, dt), res

    if remat is not None:
        # prevent_cse=False is safe (and needed for speed) under scan:
        # each iteration is staged separately, so there is no cross-branch
        # CSE for checkpointing to defend against.
        body = jax.checkpoint(body, prevent_cse=False)

    def scan_range(field, dt, lo, hi):
        return jax.lax.scan(body, (field, dt),
                            jnp.arange(lo, hi) + start_iter)

    if remat != "sqrt":
        def rollout(field: FlowField, dt):
            (field, _), results = scan_range(field, dt, 0, n_steps)
            return field, _select(results, collect_results)

        return rollout

    # sqrt policy: outer scan over √n-sized chunks with the whole chunk
    # checkpointed; n_steps = n_chunks·chunk + rem, remainder as a
    # (step-checkpointed) tail scan.
    chunk = max(1, math.isqrt(n_steps))
    n_chunks, rem = divmod(n_steps, chunk)

    def chunk_body(carry, c):
        def inner(inner_carry, j):
            return body(inner_carry, c * chunk + j + start_iter)

        carry, results = jax.lax.scan(inner, carry, jnp.arange(chunk))
        return carry, results

    chunk_body = jax.checkpoint(chunk_body, prevent_cse=False)

    def rollout(field: FlowField, dt):
        carry, results = jax.lax.scan(chunk_body, (field, dt),
                                      jnp.arange(n_chunks))
        # (n_chunks, chunk, ...) -> (n_steps_main, ...)
        results = jax.tree.map(
            lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:]), results)
        if rem:
            (field, dt), tail = scan_range(*carry, n_chunks * chunk, n_steps)
            results = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                                   results, tail)
        else:
            field = carry[0]
        return field, _select(results, collect_results)

    return rollout


def _select(stacked_results, collect_results):
    if collect_results:
        return stacked_results
    return jax.tree.map(lambda a: a[-1], stacked_results)
