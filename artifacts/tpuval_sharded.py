"""On-chip Mosaic validation of the SHARDED fused paths, on a 1-device mesh.

`artifacts/tpuval.py` records hardware truth for the single-chip kernel
families; this script does the same for the production shard_map wrappers.
Only one real TPU chip is reachable (the axon tunnel), but a 1-device
`Mesh` (and a (1,1) (z, y) mesh) still engages the exact multi-chip code:
global-row/global-z kernel modes, the halo ring machinery (self-permutes),
pencil-transpose DSTs, the fused sharded CG/BiCGSTAB/MG — all through REAL
Mosaic compiles, which interpret-mode CI cannot exercise (see
docs/validation.md "On-chip (Mosaic) validation records" for why that gap
is real).  Each config runs 3 sharded steps and compares against the
single-chip fused step; MG rows assert iteration parity with the
single-chip fused V-cycle.

Incremental + resumable like tpuval.py: each config writes the JSON as it
lands; recorded (non-ERROR) configs are skipped on rerun.
Run: cd /root/repo && python artifacts/tpuval_sharded.py [config ...]

This file recreates the lost round-3 script that produced
TPUVAL_SHARDED_r03.json (same configs and tolerances; grids may differ in
detail from the r03 run).
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from cfd_tpu import FlowField, Grid
from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                    ThermalBCConfig)
from cfd_tpu.parallel import make_mesh, make_sharded_step
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.projection import make_projection_step
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step
from cfd_tpu.solvers.poisson.base import Method, PoissonParams

STEPS = 3

_MAKERS = {"explicit_euler": make_euler_step, "rk2": make_rk2_step,
           "rk4": make_rk4_step, "projection": make_projection_step}

CONV = NSParams(source_amplitude_u=0.0, source_amplitude_v=0.0,
                alpha=1e-3, beta=0.05, T_ref=300.0,
                gravity=(0.0, -9.81, 0.0),
                thermal_bc=ThermalBCConfig(
                    left=BCType.DIRICHLET, right=BCType.DIRICHLET,
                    bottom=BCType.NEUMANN, top=BCType.NEUMANN,
                    dirichlet_values=DirichletValues(left=305.0,
                                                     right=295.0)))


def _random_field(grid, seed=0, amp=0.05):
    rng = np.random.default_rng(seed)
    f = FlowField.initialize(grid, dtype=jnp.float32)

    def r():
        return jnp.asarray(rng.normal(0, amp, grid.shape), jnp.float32)

    f = f.replace(u=r(), v=r(), p=r())
    if grid.nz > 1:
        f = f.replace(w=r())
    return f


def _run_steps(step, f, dt):
    res = None
    for i in range(STEPS):
        f, res = step(f, jnp.float32(dt), i)
    f.u.block_until_ready()
    return f, res


def pair(grid, method, mesh_axes, params=None, dt=1e-4, tol=1e-5,
         poisson_method=None, pparams=None, want_status=False,
         extra_kw=None):
    """3 sharded steps vs 3 single-chip fused steps; max |Δ| over
    (u, v, w, T) and over p."""
    params = params or NSParams()
    mk = _MAKERS[method]
    kw = dict(extra_kw or {})
    if poisson_method is not None:
        kw.update(poisson_method=poisson_method, poisson_params=pparams)
    ref_step = jax.jit(mk(grid, params, dtype=jnp.float32,
                          use_pallas=True, **kw))
    f0 = _random_field(grid)
    f_ref, _ = _run_steps(ref_step, f0, dt)

    mesh = make_mesh(jax.devices()[:1], axes=mesh_axes)
    step, place = make_sharded_step(grid, params, mesh, method,
                                    use_pallas=True, strict=True,
                                    dtype=jnp.float32, **kw)
    f_sh, res = _run_steps(step, place(f0), dt)
    if want_status:
        assert int(res.status) == 0, "sharded pressure solve not converged"

    dv = max(float(jnp.max(jnp.abs(getattr(f_sh, n) - getattr(f_ref, n))))
             for n in ("u", "v", "w", "T"))
    dp = float(jnp.max(jnp.abs(f_sh.p - f_ref.p)))
    return {"max_diff_vel_T": dv, "max_diff_p": dp,
            "ok": dv <= tol and dp <= 10 * tol, "tol": tol}


def mg_parity(mesh_axes):
    """Sharded fused multigrid vs the single-chip fused V-cycle:
    iteration parity + solution agreement (tests/parallel/
    test_fused_mg_sharded.py run on the real chip)."""
    from cfd_tpu.parallel.fused_mg import make_multigrid_sharded
    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.multigrid import make_multigrid

    n = 33
    h = 1.0 / (n - 1)
    prob = PoissonProblem(n, n, n, h, h, h)
    pp = PoissonParams(tolerance=1e-6)
    rng = np.random.default_rng(0)
    rhs = rng.normal(0.0, 1.0, (n, n, n))
    rhs[0] = rhs[-1] = 0.0
    rhs[:, 0] = rhs[:, -1] = 0.0
    rhs[:, :, 0] = rhs[:, :, -1] = 0.0
    rhs = jnp.asarray(rhs, jnp.float32)
    x0 = jnp.zeros((n, n, n), jnp.float32)

    ref = jax.jit(make_multigrid(prob, pp, use_pallas=True,
                                 min_fused_nx=0))
    r_ref = ref(x0, rhs)
    mesh = make_mesh(jax.devices()[:1], axes=mesh_axes)
    r_sh = jax.jit(make_multigrid_sharded(prob, pp, mesh))(x0, rhs)
    iters = [int(r_sh.iterations), int(r_ref.iterations)]
    diff = float(jnp.max(jnp.abs(r_sh.x - r_ref.x)))
    ok = (int(r_sh.status) == int(r_ref.status) == 0
          and iters[0] == iters[1] and diff < 1e-4)
    return {"iterations": iters, "max_diff": diff, "ok": ok}


def zy_dst_mega():
    """The (z, y)-mesh DST-fused mega family (r5 session 3): global-row
    ±2-window mega kernels with in-kernel x-only DSTs (iota row offsets,
    single-mat forward dots, arrival-hook inverse x transforms) — a new
    Mosaic compile combo.  ``make_sharded_step`` routes Py == 1 meshes to
    the z-only path, so the zy builder is invoked directly on a (1, 1)
    mesh, which still compiles the exact multi-chip kernels (halo
    exchanges degenerate to pads/identity a2a)."""
    import cfd_tpu.solvers.poisson.spectral as sp
    from cfd_tpu.parallel.fused import \
        _make_fused_sharded_projection_zy_step

    g = Grid.uniform(128, 8, 16, zmin=0.0, zmax=1.0)
    params = NSParams()
    ref_step = jax.jit(make_projection_step(
        g, params, dtype=jnp.float32, use_pallas=True,
        poisson_method=Method.FFT_DIRECT))
    f0 = _random_field(g)
    f_ref, _ = _run_steps(ref_step, f0, 1e-3)

    mesh = make_mesh(jax.devices()[:1], axes=("z", "y"))
    calls = []
    orig = sp.make_dst_fused_sharded_zy_pieces

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    sp.make_dst_fused_sharded_zy_pieces = spy
    try:
        step = _make_fused_sharded_projection_zy_step(
            g, params, mesh, jnp.float32, False, 1, 1,
            poisson_method=Method.FFT_DIRECT)
    finally:
        sp.make_dst_fused_sharded_zy_pieces = orig
    assert calls, "zy DST-fused mega branch did not engage"
    f_sh, res = _run_steps(jax.jit(step), f0, 1e-3)
    assert int(res.status) == 0

    dv = max(float(jnp.max(jnp.abs(getattr(f_sh, n) - getattr(f_ref, n))))
             for n in ("u", "v", "w", "T"))
    dp = float(jnp.max(jnp.abs(f_sh.p - f_ref.p)))
    return {"max_diff_vel_T": dv, "max_diff_p": dp,
            "ok": dv <= 1e-5 and dp <= 1e-4, "tol": 1e-5}


def _grids():
    g3 = Grid.uniform(128, 8, 16, zmin=0.0, zmax=1.0)
    g3s = Grid.stretched(128, 8, 16, zmin=0.0, zmax=1.0, beta=1.5,
                         stretch_axes="xy")
    g2 = Grid.uniform(128, 24)
    g2s = Grid.stretched(128, 24, beta=1.5, stretch_axes="xy")
    return g3, g3s, g2, g2s


def _configs():
    g3, g3s, g2, g2s = _grids()
    krylov = PoissonParams(max_iterations=400, tolerance=1e-6)
    rows = {}
    for tag, axes in (("z", ("z",)), ("zy", ("z", "y"))):
        rows[f"euler_{tag}"] = (
            lambda a=axes: pair(g3, "explicit_euler", a))
        rows[f"euler_{tag}_stretched"] = (
            lambda a=axes: pair(g3s, "explicit_euler", a))
        rows[f"rk2_{tag}"] = lambda a=axes: pair(g3, "rk2", a)
        rows[f"proj_{tag}_dst"] = (
            lambda a=axes: pair(g3, "projection", a, dt=1e-3,
                                poisson_method=Method.FFT_DIRECT))
        rows[f"proj_{tag}_cg"] = (
            lambda a=axes: pair(g3, "projection", a, dt=1e-3, tol=1e-4,
                                poisson_method=Method.CG, pparams=krylov,
                                want_status=True))
        rows[f"proj_{tag}_bicgstab"] = (
            lambda a=axes: pair(g3, "projection", a, dt=1e-3, tol=1e-3,
                                poisson_method=Method.BICGSTAB,
                                pparams=krylov, want_status=True))
        rows[f"mg_{tag}"] = lambda a=axes: mg_parity(a)
    rows["euler_z_convection"] = (
        lambda: pair(g3, "explicit_euler", ("z",), params=CONV))
    rows["rk4_z"] = lambda: pair(g3, "rk4", ("z",))
    # 2D y-decomposition (block-marching kernels in global-row mode)
    rows["euler_2d_y"] = lambda: pair(g2, "explicit_euler", ("y",))
    rows["euler_2d_y_stretched"] = (
        lambda: pair(g2s, "explicit_euler", ("y",)))
    rows["rk2_2d_y"] = lambda: pair(g2, "rk2", ("y",))
    rows["proj_2d_y"] = (
        lambda: pair(g2, "projection", ("y",), dt=1e-3,
                     poisson_method=Method.FFT_DIRECT))
    # r5: consistent-scheme (stretched x/y) projection through the
    # z-sharded eigenbasis-fused mega kernels vs the single-chip
    # eigenbasis-fused step (the sharded TDMA stage is un-fused, so
    # expect ~1e-6-class f32 path differences, not bit equality).
    rows["proj_z_consistent"] = (
        lambda: pair(g3s, "projection", ("z",), dt=1e-3,
                     params=NSParams(nonuniform_scheme="consistent"),
                     poisson_method=Method.FFT_DIRECT))
    # r5: the y-sharded DST-fused 2D family (global-row marching kernels
    # WITH in-kernel x DSTs — a new Mosaic compile combo) and the
    # sharded spectral_precision=HIGH plumbing (per-shard bf16_3x
    # in-kernel transforms).  Both vs the same-precision single-chip
    # fused step, so only sharding-path rounding remains.
    g2dst = Grid.uniform(1024, 64)
    rows["proj_2d_y_dst"] = (
        lambda: pair(g2dst, "projection", ("y",), dt=1e-3,
                     poisson_method=Method.FFT_DIRECT))
    rows["proj_z_dst_high"] = (
        lambda: pair(g3, "projection", ("z",), dt=1e-3, tol=1e-4,
                     poisson_method=Method.FFT_DIRECT,
                     extra_kw={"spectral_precision":
                               jax.lax.Precision.HIGH}))
    # r5 session 3: the (z, y)-mesh DST-fused mega kernels (see
    # zy_dst_mega's docstring for why the builder is invoked directly)
    rows["proj_zy_dst_mega"] = zy_dst_mega
    return rows


def main():
    import os
    args = sys.argv[1:]
    rnd = "05"
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1].zfill(2)
        del args[i:i + 2]
    path = f"TPUVAL_SHARDED_r{rnd}.json"
    out = {"round": rnd, "steps": STEPS, "dtype": "float32",
           "platform": "tpu (axon), 1-device mesh"}
    if os.path.exists(path):
        with open(path) as f:
            out.update(json.load(f))
    configs = _configs()
    names = args or list(configs)
    for name in names:
        prev = out.get(name)
        if isinstance(prev, dict):
            print(name, "already done:", prev, flush=True)
            continue
        try:
            out[name] = configs[name]()
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERROR: {e!r}"[:200]
        print(name, out[name], flush=True)
        out["failures"] = sum(
            1 for v in out.values()
            if (isinstance(v, str) and v.startswith("ERROR"))
            or (isinstance(v, dict) and v.get("ok") is False))
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print("done, failures =", out.get("failures", 0), flush=True)


if __name__ == "__main__":
    main()
