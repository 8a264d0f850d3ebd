"""Solver-registry depth tests — the analog of the reference's
`solver_registry.c` unit coverage (register/unregister/describe/backend
inference, 16 default names, custom factories, NSSolver vtable surface).
"""

import numpy as np
import pytest

from cfd_tpu import FlowField, Grid
from cfd_tpu.api.registry import SolverRegistry, create_registry, infer_backend
from cfd_tpu.core.features import Backend
from cfd_tpu.core.status import Status
from cfd_tpu.solvers.ns.solver import Capability, NSSolver


def test_default_names_registered():
    """All 16 reference solver names exist (`solver_registry.c:213-249`)."""
    reg = create_registry()
    names = reg.list()
    base = {"explicit_euler", "rk2", "rk4", "projection"}
    for b in base:
        assert b in names
        assert f"{b}_optimized" in names or f"{b}_omp" in names \
            or f"{b}_gpu" in names
    assert len(names) >= 16


def test_backend_inference_from_suffix():
    """Suffix → backend mapping (`solver_registry.c:253-270`)."""
    assert infer_backend("explicit_euler") == Backend.SCALAR
    assert infer_backend("projection_optimized") == Backend.SIMD
    assert infer_backend("rk2_omp") == Backend.OMP
    assert infer_backend("projection_gpu") == Backend.CUDA


def test_register_unregister_custom():
    reg = create_registry()

    def factory():
        from cfd_tpu.api.registry import _default_factory
        return _default_factory("projection")()

    assert reg.register("my_solver", factory) == 0
    assert reg.has("my_solver")
    s = reg.create("my_solver")
    assert s is not None
    assert reg.unregister("my_solver") == 0
    assert not reg.has("my_solver")
    assert reg.create("my_solver") is None


def test_register_duplicate_and_bad_args():
    reg = create_registry()
    n0 = len(reg.list())
    # replacing an existing name is allowed (last registration wins)
    reg.register("explicit_euler", lambda: None)
    assert len(reg.list()) == n0
    assert reg.unregister("does_not_exist") != 0


def test_describe():
    reg = create_registry()
    d = reg.describe("projection")
    assert d and "rojection" in d
    assert reg.describe("nope") is None


def test_list_by_backend_partition():
    reg = create_registry()
    all_names = set(reg.list())
    union = set()
    for b in Backend:
        union |= set(reg.list_by_backend(b))
    assert union == all_names


def test_per_registry_isolation():
    """Registries are per-simulation instances, not global state
    (`test_reentrancy.c` analog)."""
    a = create_registry()
    b = create_registry()
    a.register("only_in_a", lambda: None)
    assert a.has("only_in_a") and not b.has("only_in_a")
    a.unregister("rk2")
    assert not a.has("rk2") and b.has("rk2")


def test_nssolver_vtable_surface():
    """The NSSolver wrapper exposes the reference vtable fields
    (`navier_stokes_solver.h:254-277`)."""
    reg = create_registry()
    s = reg.create("projection")
    assert s.name == "projection"
    assert isinstance(s.description, str) and s.description
    assert s.capabilities & Capability.INCOMPRESSIBLE
    assert s.capabilities & Capability.TRANSIENT

    g = Grid.uniform(16, 16)
    from cfd_tpu.solvers.ns import NSParams
    assert s.init(g, NSParams()) == Status.SUCCESS
    f = FlowField.initialize(g)
    f2, stats = s.step(f, 0.001)
    assert stats.status == Status.SUCCESS
    assert np.all(np.isfinite(np.asarray(f2.u)))
    dt = s.compute_dt(f)
    assert 1e-6 <= dt <= 0.01
    f3 = s.apply_boundary(f)
    assert f3.u.shape == f.u.shape


def test_step_before_init_raises():
    reg = create_registry()
    s = reg.create("rk2")
    f = FlowField.initialize(Grid.uniform(8, 8))
    with pytest.raises(Exception):
        s.step(f, 0.001)


def test_nssolver_spectral_precision_knob(monkeypatch):
    """The registry projection solver plumbs ``spectral_precision``
    (framework extension: the DST-fused fast mode reachable through the
    facade layer) into the step builder.  CPU XLA ignores dot precision,
    so this pins the plumbing with a spy rather than numerics (the
    numeric deltas are pinned on-chip: TPUVAL_r05
    projection_dst_fused_high)."""
    import jax

    import cfd_tpu.solvers.ns.solver as solver_mod
    from cfd_tpu.solvers.ns import NSParams

    seen = []
    orig = solver_mod.make_projection_step

    def spy(*a, **k):
        seen.append(k.get("spectral_precision"))
        return orig(*a, **k)

    monkeypatch.setattr(solver_mod, "make_projection_step", spy)

    g = Grid.uniform(64, 16)
    reg = create_registry()
    s = reg.create("projection")
    s.spectral_precision = jax.lax.Precision.HIGH
    assert s.init(g, NSParams()) == Status.SUCCESS
    assert seen == [jax.lax.Precision.HIGH]

    f = FlowField.initialize(g)
    f2, st = s.step(f, 0.001)
    assert st.status == Status.SUCCESS
    assert np.all(np.isfinite(np.asarray(f2.p)))
