"""Fused multi-chip projection step: shard_map + ring halos + pencil DST.

This is the *performance* half of the domain-decomposition design (the
correctness half — GSPMD placement of the jnp step — lives in
``sharded.py``).  It is the TPU-native replacement for the reference's
missing MPI layer (`ROADMAP.md:88`, SURVEY §2.9), built so every hot loop
stays in the single-chip fast path:

* fields are **z-decomposed** over a mesh axis ``'z'`` (x stays the lane
  dimension, y the sublane dimension — untouched, so every in-plane kernel
  is bit-identical to the single-chip one); the projection additionally
  supports a **2D (z, y) device mesh** (`_make_fused_sharded_projection_zy_step`:
  global-row-mode kernels + 4-row y halos + two-axis pencil DST) for pod
  scales where z-planes alone run out;
* each shard runs the **rolling-plane Pallas kernels** on its local block,
  halo-padded by one plane per side via two ``lax.ppermute``s over ICI
  (only the *7-point-halo* inputs are exchanged; plane-only inputs are
  zero-padded locally, their pad planes are never read);
* the pressure solve is the **pencil-transpose distributed DST**
  (`..solvers.poisson.spectral.make_btilde_pipeline_sharded`): local MXU
  einsums + two ``all_to_all``s;
* global z-shell semantics (the reference's boundary save/restore idiom,
  `solver_projection.c:187-189,277-278`) are restored per edge shard with
  one-plane masked writes.

Per step, the inter-chip traffic is 5 single-plane ppermute pairs + 2
all-to-alls — all on ICI; there is no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.field import FlowField
from ..core.grid import Grid
from ..solvers.energy import apply_thermal_bcs, make_energy_step, \
    validate_thermal_bc
from ..solvers.ns.common import field_status_and_diagnostics, \
    validate_grid_for_solver
from ..solvers.ns.params import NSParams, StepResult
from ..solvers.poisson.base import PoissonProblem
from ..solvers.poisson.spectral import make_btilde_pipeline_sharded


def _mesh_z_size(mesh: Mesh):
    """Shard count along 'z' if the mesh is z-only (other axes size 1)."""
    if "z" not in mesh.axis_names:
        return None
    for name in mesh.axis_names:
        if name != "z" and mesh.shape[name] != 1:
            return None
    return mesh.shape["z"]


def _mesh_y_size(mesh: Mesh):
    """Shard count along 'y' if the mesh is y-only (other axes size 1)."""
    if "y" not in mesh.axis_names:
        return None
    for name in mesh.axis_names:
        if name != "y" and mesh.shape[name] != 1:
            return None
    return mesh.shape["y"]


def _mesh_zy_sizes(mesh: Mesh):
    """(Pz, Py) when the mesh spans only 'z' and/or 'y' axes (any other
    axis must have size 1), else None.  Py is 1 when no 'y' axis exists —
    the z-only decomposition is the Py == 1 special case."""
    if "z" not in mesh.axis_names:
        return None
    for name in mesh.axis_names:
        if name not in ("z", "y") and mesh.shape[name] != 1:
            return None
    return mesh.shape["z"], mesh.shape.get("y", 1)


def _zy_halo_helpers(nzl: int, nyl: int, pz: int, py: int):
    """Shared (z, y) 2D-mesh machinery for the fused euler/RK wrappers:

    ``ypad``   — 4 halo rows per side over a PERIODIC y ring (the
                 wraparound pair carries global rows ny−4..ny−1 / 0..3 to
                 the edge shards, which is exactly what the RK kernels'
                 periodic-interior shift∓3 substitutions need; harmless
                 for Euler, whose face rows are mask-restored anyway);
    ``hpad``   — one halo plane per side over the open z ring, applied to
                 an already y-padded block so corners arrive in two hops;
    ``unpad``  — drop the halo planes/rows;
    ``wrap_y_rows`` / ``wrap_z_shell`` — post-kernel global boundary
                 restore per face: "periodic" (cross-shard edge-to-edge
                 ppermute), "neumann" (adjacent interior row/plane, local
                 to the edge shard), or a float Dirichlet constant.
                 Apply y first, then z — later faces own the corners
                 (`core_impl.h:92-120` sequential order).
    """
    fwd_z = [(i, i + 1) for i in range(pz - 1)]
    bwd_z = [(i + 1, i) for i in range(pz - 1)]
    fwd_y = [(i, (i + 1) % py) for i in range(py)]
    bwd_y = [((i + 1) % py, i) for i in range(py)]

    def ypad(x):
        if py == 1:
            return jnp.concatenate([x[:, -4:], x, x[:, :4]], axis=1)
        lo = lax.ppermute(x[:, -4:], "y", fwd_y)
        hi = lax.ppermute(x[:, :4], "y", bwd_y)
        return jnp.concatenate([lo, x, hi], axis=1)

    def hpad(xp):
        if pz == 1:
            return jnp.pad(xp, ((1, 1), (0, 0), (0, 0)))
        lo = lax.ppermute(xp[-1:], "z", fwd_z)
        hi = lax.ppermute(xp[:1], "z", bwd_z)
        return jnp.concatenate([lo, xp, hi], axis=0)

    def unpad(o):
        return o[1:-1, 4:-4]

    def wrap_y_rows(out, firsty, lasty, yspec=("periodic", "periodic")):
        lo_spec, hi_spec = yspec
        if lo_spec == "periodic":
            src_lo = out[:, nyl - 2:nyl - 1] if py == 1 else lax.ppermute(
                out[:, nyl - 2:nyl - 1], "y", [(py - 1, 0)])
        elif lo_spec == "neumann":
            src_lo = out[:, 1:2]
        else:
            src_lo = jnp.full_like(out[:, 0:1], lo_spec)
        if hi_spec == "periodic":
            src_hi = out[:, 1:2] if py == 1 else lax.ppermute(
                out[:, 1:2], "y", [(0, py - 1)])
        elif hi_spec == "neumann":
            src_hi = out[:, nyl - 2:nyl - 1]
        else:
            src_hi = jnp.full_like(out[:, 0:1], hi_spec)
        out = out.at[:, 0:1].set(jnp.where(firsty, src_lo, out[:, 0:1]))
        out = out.at[:, nyl - 1:nyl].set(
            jnp.where(lasty, src_hi, out[:, nyl - 1:nyl]))
        return out

    def wrap_z_shell(out, first, last, zspec=("periodic", "periodic")):
        lo_spec, hi_spec = zspec
        if lo_spec == "periodic":
            src_lo = out[nzl - 2:nzl - 1] if pz == 1 else lax.ppermute(
                out[nzl - 2:nzl - 1], "z", [(pz - 1, 0)])
        elif lo_spec == "neumann":
            src_lo = out[1:2]
        else:
            src_lo = jnp.full_like(out[0:1], lo_spec)
        if hi_spec == "periodic":
            src_hi = out[1:2] if pz == 1 else lax.ppermute(
                out[1:2], "z", [(0, pz - 1)])
        elif hi_spec == "neumann":
            src_hi = out[nzl - 2:nzl - 1]
        else:
            src_hi = jnp.full_like(out[0:1], hi_spec)
        out = out.at[0:1].set(jnp.where(first, src_lo, out[0:1]))
        out = out.at[nzl - 1:nzl].set(jnp.where(last, src_hi,
                                                out[nzl - 1:nzl]))
        return out

    return ypad, hpad, unpad, wrap_y_rows, wrap_z_shell


def _stretch_pins_zy_fn(grid: Grid, params: NSParams, nyl: int, dtype):
    """Per-shard stretch-pin slicer for the (z, y) fused euler/RK paths,
    or None on uniform x/y.

    The coefficient/source pin planes are built GLOBALLY (numpy, trace-
    safe) with 4 edge-replicated halo rows per side, closed over as
    replicated constants, and each shard dynamic-slices its
    (2, nyl+8, nx) row window by its y index — halo-row pin values are
    read only by discarded halo-row outputs, so the edge replication is
    inert.  The kernels are built in reserve-only mode
    (``make_euler_fused``/``make_rk_stage`` with ``global_ny`` +
    ``stretch``) and the wrapper appends these slices at call time."""
    stretch = _stretch_tuple(grid, params)
    if stretch is None:
        return None
    import numpy as np

    from ..ops.pallas.stretch import stretch_pins, stretch_pins_consistent
    dx_arr, dy_arr, x_coords, y_coords = stretch
    mk = (stretch_pins_consistent
          if params.nonuniform_scheme == "consistent" else stretch_pins)
    pins_g = mk(grid.ny, grid.nx, dx_arr, dy_arr, x_coords, y_coords,
                np_dtype=jnp.zeros((), dtype).dtype)
    padded = [jnp.asarray(np.pad(p, ((0, 0), (4, 4), (0, 0)), mode="edge"))
              for p in pins_g]

    def local(yi):
        z32 = jnp.int32(0)
        start = (yi * nyl).astype(jnp.int32)
        return [lax.dynamic_slice(p, (z32, start, z32),
                                  (2, nyl + 8, p.shape[2]))
                for p in padded]

    return local


def _stretch_inputs_2d_fn(grid: Grid, params: NSParams, nyl: int, dtype):
    """Per-shard stretch-input slicer for the 2D fused euler/RK paths, or
    None on uniform x/y.

    The y-weight planes are built GLOBALLY (numpy, `stretch_inputs_2d`)
    with 4 edge-replicated halo rows per side; each shard dynamic-slices
    its (nyl+8, nx) row window by its y index (weights apply at the
    stencil's CENTER row, so halo-row values are read only by discarded
    halo-row outputs and the edge replication is inert).  The x-row pin
    is shard-invariant and replicates verbatim.  The kernels are built in
    reserve-only mode (``global_ny`` + ``stretch``) and the wrapper
    appends these at call time."""
    stretch = _stretch_tuple(grid, params)
    if stretch is None:
        return None
    import numpy as np

    from ..ops.pallas.stretch import stretch_inputs_2d
    dx_arr, dy_arr, x_coords, y_coords = stretch
    xrows, yplanes = stretch_inputs_2d(
        grid.ny, grid.nx, dx_arr, dy_arr, x_coords, y_coords,
        params.nonuniform_scheme, np_dtype=jnp.zeros((), dtype).dtype)
    padded = [jnp.asarray(np.pad(p, ((4, 4), (0, 0)), mode="edge"))
              for p in yplanes]
    xrows_j = jnp.asarray(xrows)

    def local(yi):
        start = (yi * nyl).astype(jnp.int32)
        yps = [lax.dynamic_slice(p, (start, jnp.int32(0)),
                                 (nyl + 8, p.shape[1])) for p in padded]
        return yps, xrows_j

    return local


def _stretch_reason_2d(grid: Grid, params: NSParams) -> str | None:
    """Spacing gate for the 2D sharded fused paths — `stretch_gate`
    verbatim (no z-uniformity requirement in 2D)."""
    from ..solvers.ns.common import stretch_gate
    return stretch_gate(grid, params)[1]


def _stretch_reason(grid: Grid, params: NSParams) -> str | None:
    """Spacing gate for the sharded euler/RK fused paths — delegates to
    `solvers.ns.common.stretch_gate` (ONE predicate set for single-chip
    and sharded dispatch) plus the z-uniformity the streaming kernels
    require.  Stretched x/y pins are shard-invariant under
    z-decomposition, so the single-chip pins replicate verbatim."""
    from ..solvers.ns.common import stretch_gate

    if not grid.is_uniform("z"):
        return "fused kernels need uniform z spacing"
    _, reason = stretch_gate(grid, params)
    return reason


def _stretch_tuple(grid: Grid, params: NSParams):
    """The kernels' ``stretch=`` argument: None on uniform x/y."""
    from ..solvers.ns.common import stretch_gate
    return stretch_gate(grid, params)[0]


def fused_sharded_unsupported_reason(grid: Grid, params: NSParams,
                                     mesh: Mesh, dtype) -> str | None:
    """None when the fused shard_map path applies, else a human reason."""
    from ..ops.pallas.projection_kernels import projection_kernels_supported

    if dtype != jnp.float32:
        return f"fused kernels are float32-only (got {dtype})"
    if params.source_func is not None:
        return "custom source callables use the jnp path"
    consistent = (params.nonuniform_scheme == "consistent"
                  and not (grid.is_uniform("x") and grid.is_uniform("y")))
    if consistent:
        # consistent-scheme: eigenbasis-fused mega kernels on a z-only
        # mesh (r5) — the 2D marching kernels and the y-sharded row
        # slicing evaluate the uniform operator and stay jnp here
        if grid.nz <= 2:
            return ("no fused sharded 2D consistent-scheme projection "
                    "(the 2D marching kernels are uniform-only)")
        sizes = _mesh_zy_sizes(mesh)
        if sizes is not None and sizes[1] > 1:
            return ("consistent-scheme fused sharded projection needs a "
                    "z-only mesh")
    if grid.nz <= 2:
        # 2D path: y-decomposition feeding the block-marching kernels.
        from ..ops.pallas.projection2d import projection2d_supported

        n = _mesh_y_size(mesh)
        if n is None:
            return ("fused sharded 2D projection needs a y-only mesh "
                    f"(got axes {dict(mesh.shape)})")
        if grid.ny % n != 0 or grid.ny // n < 24:
            return (f"ny={grid.ny} must be divisible by {n} shards with "
                    ">= 24 rows per shard")
        if not projection2d_supported(grid.ny // n + 8, grid.nx,
                                      buoyant=params.buoyancy_enabled):
            return (f"local block ({grid.ny // n}+8, {grid.nx}) outside "
                    "block-marching support (nx%128, rows%8, VMEM)")
        return None
    sizes = _mesh_zy_sizes(mesh)
    if sizes is None:
        return ("fused sharded projection needs a mesh over ('z'[, 'y']) "
                f"axes (got axes {dict(mesh.shape)})")
    pz, py = sizes
    if grid.nz % pz != 0 or grid.nz // pz < 2:
        return (f"nz={grid.nz} must be divisible by {pz} shards with >= 2 "
                "planes per shard")
    if py > 1:
        nyl = grid.ny // py
        if grid.ny % py != 0 or nyl < 8 or nyl % 8 != 0:
            return (f"ny={grid.ny} must be divisible by {py} y-shards "
                    "with a multiple of 8 (>= 8) rows per shard")
        if not projection_kernels_supported(grid.nz // pz + 2, nyl + 8,
                                            grid.nx):
            return (f"local block ({grid.nz // pz}+2, {nyl}+8, {grid.nx}) "
                    "outside rolling-kernel support (nx%128, VMEM)")
        return None
    if not projection_kernels_supported(grid.nz // pz + 2, grid.ny, grid.nx):
        return (f"local block ({grid.nz // pz}+2, {grid.ny}, {grid.nx}) "
                "outside rolling-kernel support (nx%128, ny%8, VMEM)")
    return None


def make_fused_sharded_projection_step(grid: Grid, params: NSParams,
                                       mesh: Mesh, dtype=jnp.float32,
                                       poisson_params=None,
                                       poisson_method=None,
                                       interpret: bool = None,
                                       spectral_precision=None):
    """Build (field, dt, iter) → (field, StepResult), z-sharded over mesh.

    ``poisson_method`` (default FFT_DIRECT) picks the distributed pressure
    solve: the exact pencil-transpose DST, or ``Method.CG`` — the fused
    shard_map CG (`.fused_cg`: ring-halo rolling lap+dot kernel, psum
    dots), honoring ``poisson_params``, for cases that must iterate.
    ``interpret`` defaults to True off-TPU so the same program runs on
    virtual CPU meshes (tests, driver dryrun).
    ``spectral_precision`` (default HIGHEST) sets the in-kernel xy
    transform precision on the DST-fused mega variant, mirroring the
    single-chip ``make_projection_step`` knob — HIGH runs the 3-pass
    bf16 split (`ops/pallas/rolling.hp_dot_general`) per shard for the
    ~1.4× step speedup at ~2e-5 relative pressure error.  Only the
    per-shard xy transforms are affected (the cross-shard z line solve
    stays f32); the non-DST-fused fallbacks ignore it (exact HIGHEST).
    """
    from ..solvers.poisson.base import Method, PoissonParams

    reason = fused_sharded_unsupported_reason(grid, params, mesh, dtype)
    if reason is not None:
        raise ValueError(f"fused sharded projection unsupported: {reason}")
    validate_grid_for_solver(grid, grid.shape)
    if params.energy_enabled:
        validate_thermal_bc(params.thermal_bc, grid)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    if grid.nz <= 2:
        return _make_fused_sharded_projection2d_step(
            grid, params, mesh, dtype, poisson_method, interpret,
            spectral_precision)
    poisson_method = (Method.FFT_DIRECT if poisson_method is None
                      else Method(poisson_method))
    if poisson_method not in (Method.FFT_DIRECT, Method.CG,
                              Method.BICGSTAB):
        raise ValueError("fused sharded projection supports FFT_DIRECT, "
                         f"CG and BICGSTAB pressure solves "
                         f"(got {poisson_method})")

    pz, py = _mesh_zy_sizes(mesh)
    if py > 1:
        return _make_fused_sharded_projection_zy_step(
            grid, params, mesh, dtype, interpret, pz, py,
            poisson_method, poisson_params, spectral_precision)

    nz, ny, nx = grid.nz, grid.ny, grid.nx
    n_shards = pz
    nzl = nz // n_shards

    from ..ops.pallas.projection_kernels import ProjectionKernels
    consistent = (params.nonuniform_scheme == "consistent"
                  and not (grid.is_uniform("x") and grid.is_uniform("y")))
    pk = None
    if not consistent:
        pk = ProjectionKernels(nzl + 2, ny, nx, grid.dx0, grid.dy0,
                               grid.dz0, grid.xmin, grid.ymin, dtype,
                               beta=params.beta, T_ref=params.T_ref,
                               gravity=params.gravity,
                               interpret=interpret, global_nz=nz)
        if not (pk.ok and pk.btilde_k is not None):
            raise ValueError("fused sharded projection: kernel build "
                             "failed")

    if consistent:
        from ..solvers.poisson.nonuniform import NonuniformPoissonProblem
        problem = NonuniformPoissonProblem.from_grid(grid)
    else:
        problem = PoissonProblem(nx, ny, nz, grid.dx0, grid.dy0, grid.dz0)
    pencil = cg_local = None
    pk_dst = zsolve_local = None
    if consistent:
        # Consistent-scheme (stretched x/y) z-sharded projection (r5):
        # the eigenbasis-fused mega kernels run per shard exactly like
        # the uniform DST family — the generalized-eigenbasis xy
        # transforms are plane-local under z decomposition and the
        # consistent weight pins are z-invariant — with the z line solve
        # over the generalized eigenvalue sums as the only cross-shard
        # stage.  FFT_DIRECT only: the fused CG/BiCGSTAB kernels
        # evaluate the uniform operator (the jnp GSPMD fallback carries
        # the FV-symmetrized Krylov solves).
        from ..ops.pallas.stretch import stretch_spacing_ok
        from ..solvers.poisson.nonuniform import (
            make_nonuniform_fused_sharded_pieces, nonuniform_face_coeffs,
            nonuniform_fused_sharded_supported)
        if poisson_method != Method.FFT_DIRECT:
            raise ValueError(
                "consistent-scheme fused sharded projection supports the "
                f"FFT_DIRECT pressure solve only (got {poisson_method})")
        if not (nonuniform_fused_sharded_supported(problem, n_shards)
                and stretch_spacing_ok(grid.dx, grid.dy)):
            raise ValueError(
                "consistent-scheme fused sharded projection: eigenbasis-"
                f"fused shapes unsupported for ({nz}, {ny}, {nx}) over "
                f"{n_shards} shards")
        mats, zs = make_nonuniform_fused_sharded_pieces(
            problem, n_shards, axis_name="z", dtype=dtype,
            interpret=interpret)
        pk_try = ProjectionKernels(
            nzl + 2, ny, nx, grid.dx0, grid.dy0, grid.dz0,
            grid.xmin, grid.ymin, dtype, emit="btilde",
            beta=params.beta, T_ref=params.T_ref,
            gravity=params.gravity, interpret=interpret,
            global_nz=nz, dst_mats=mats,
            dst_precision=spectral_precision,
            stretch_consistent=(grid.dx, grid.dy, grid.x, grid.y),
            face_coeffs=nonuniform_face_coeffs(problem))
        if not pk_try.mega_ok:
            raise ValueError("consistent-scheme fused sharded projection:"
                             " mega kernel build failed")
        pk_dst, zsolve_local = pk_try, zs
    elif poisson_method == Method.FFT_DIRECT:
        # DST-fused mega variant (r5): the xy transforms are plane-local
        # under z decomposition, so the single-chip mega kernels run per
        # shard (in-kernel forward DST in the ±2-window predictor,
        # inverse-DST-on-arrival in the corrector); the z line solve is
        # the only cross-shard stage (y-pencil all_to_alls around a
        # per-slab Thomas sweep).  Falls back to the emit-b̃ +
        # pencil-transpose-DST path when the shapes don't qualify.
        from ..solvers.poisson.spectral import (
            dst_fused_sharded_supported, make_dst_fused_sharded_pieces)
        if dst_fused_sharded_supported(problem, n_shards):
            mats, zs = make_dst_fused_sharded_pieces(
                problem, n_shards, axis_name="z", dtype=dtype,
                interpret=interpret)
            pk_try = ProjectionKernels(
                nzl + 2, ny, nx, grid.dx0, grid.dy0, grid.dz0,
                grid.xmin, grid.ymin, dtype, emit="btilde",
                beta=params.beta, T_ref=params.T_ref,
                gravity=params.gravity, interpret=interpret,
                global_nz=nz, dst_mats=mats,
                dst_precision=spectral_precision)
            if pk_try.mega_ok:
                pk_dst, zsolve_local = pk_try, zs
    if poisson_method == Method.CG:
        from .fused_cg import make_cg_fused_sharded_local
        cg_local = make_cg_fused_sharded_local(
            problem, poisson_params or PoissonParams(), n_shards,
            dtype=dtype, interpret=interpret)
        if cg_local is None:
            raise ValueError("fused sharded projection: CG kernel build "
                             "failed")
    elif poisson_method == Method.BICGSTAB:
        # same local (x, rhs) → PoissonResult interface as the CG body
        from .fused_bicgstab import make_bicgstab_fused_sharded_local
        cg_local = make_bicgstab_fused_sharded_local(
            problem, poisson_params or PoissonParams(), n_shards,
            dtype=dtype, interpret=interpret)
        if cg_local is None:
            raise ValueError("fused sharded projection: BiCGSTAB kernel "
                             "build failed")
    elif pk_dst is None:
        pencil = make_btilde_pipeline_sharded(
            problem, "z", n_shards, dtype,
            precision=(spectral_precision or jax.lax.Precision.HIGHEST))
    energy_step = make_energy_step(grid, params.alpha,
                                   params.heat_source_func,
                                   scheme=params.nonuniform_scheme)

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    def hpad(x):
        """Halo-pad (nzl, ny, nx) → (nzl+2, ny, nx) via ring ppermutes.

        Edge shards receive zero halo planes (ppermute default) — their
        outer output planes are overwritten by the shell fix below.
        """
        if n_shards == 1:
            return jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
        lo = lax.ppermute(x[-1:], "z", fwd)   # left neighbor's last plane
        hi = lax.ppermute(x[:1], "z", bwd)    # right neighbor's first plane
        return jnp.concatenate([lo, x, hi], axis=0)

    def hpad2(x):
        """±2-plane halo pad (nzl, ny, nx) → (nzl+4, ny, nx) for the
        mega predictor's 5-plane windows; edge shards receive zero halo
        planes (their star values are discarded by the global z-shell
        select in-kernel + the wrapper shell fix)."""
        if n_shards == 1:
            return jnp.pad(x, ((2, 2), (0, 0), (0, 0)))
        lo = lax.ppermute(x[-2:], "z", fwd)
        hi = lax.ppermute(x[:2], "z", bwd)
        return jnp.concatenate([lo, x, hi], axis=0)

    def zpad(x, n=1):
        """Zero-pad plane-only inputs (their pad planes are never read)."""
        return jnp.pad(x, ((n, n), (0, 0), (0, 0)))

    def fix_shell(out, shell_src, first, last):
        """Restore global z-shell planes (reference save/restore idiom)."""
        out = out.at[0].set(jnp.where(first, shell_src[0], out[0]))
        out = out.at[-1].set(jnp.where(last, shell_src[-1], out[-1]))
        return out

    def local_step_dst(u, v, w, p, T, dt, rho0, su_amp, sv_amp):
        """DST-fused mega variant: 2 marching kernels + the y-pencil
        z line solve per step (the single-chip r4 structure, per shard)."""
        idx = lax.axis_index("z")
        first = idx == 0
        last = idx == n_shards - 1
        z_off = (idx * nzl).astype(dtype)

        eT = {"T": hpad2(T.astype(dtype))} if pk_dst.buoyant else {}
        us, vs, ws, bt = [
            o[2:-2] for o in pk_dst.predictor_poisson_input(
                hpad2(u), hpad2(v), hpad2(w), zpad(p, 2), dt,
                jnp.asarray(params.mu, dtype), su_amp, sv_amp,
                rho0 / dt, z_offset=z_off, **eT)]
        us = fix_shell(us, u, first, last)
        vs = fix_shell(vs, v, first, last)
        ws = fix_shell(ws, w, first, last)
        # zero the global z-shell b̃ planes — transform-space zeroing is
        # exact (the xy DST is linear and plane-local)
        zero = jnp.zeros_like(bt[0])
        bt = fix_shell(bt, jnp.stack([zero, zero]), first, last)

        xhat = zsolve_local(bt)
        # x̂ halos exchanged in TRANSFORM space; the corrector's arrival
        # hook inverse-DSTs each plane exactly once.  The TDMA output
        # already carries the global mirror shells on the edge shards'
        # owned planes, so the p output needs no wrapper fix.
        un, vn, wn, p_new = [
            o[1:-1] for o in pk_dst.corrector_diag(
                zpad(us), zpad(vs), zpad(ws), hpad(xhat), dt / rho0)]
        un = fix_shell(un, us, first, last)
        vn = fix_shell(vn, vs, first, last)
        wn = fix_shell(wn, ws, first, last)
        return un, vn, wn, p_new, jnp.zeros((), dtype), jnp.bool_(True)

    def local_step(u, v, w, p, T, dt, rho0, su_amp, sv_amp):
        idx = lax.axis_index("z")
        first = idx == 0
        last = idx == n_shards - 1

        s_pred = jnp.stack([dt, jnp.asarray(params.mu, dtype),
                            su_amp, sv_amp])
        # Buoyancy (when compiled in): step-start T rides as one extra
        # plane-only input (pad planes never read).
        eT = (zpad(T.astype(dtype)),) if pk.buoyant else ()
        us = pk.pred_u(s_pred, hpad(u), zpad(v), zpad(w), *eT)[0][1:-1]
        vs = pk.pred_v(s_pred, hpad(v), zpad(u), zpad(w), *eT)[0][1:-1]
        ws = pk.pred_w(s_pred, hpad(w), zpad(u), zpad(v), *eT)[0][1:-1]
        us = fix_shell(us, u, first, last)
        vs = fix_shell(vs, v, first, last)
        ws = fix_shell(ws, w, first, last)

        if cg_local is not None:
            (rhs_loc,) = pk.divergence((rho0 / dt)[None], hpad(ws),
                                       zpad(us), zpad(vs))
            rhs_loc = rhs_loc[1:-1]
            zero = jnp.zeros_like(rhs_loc[0])
            rhs_loc = fix_shell(rhs_loc, jnp.stack([zero, zero]),
                                first, last)
            pres = cg_local(p, rhs_loc)
            p_new = pres.x
            p_res = pres.final_residual
            p_ok = pres.status == 0
        else:
            bt = pk.btilde(zpad(us), zpad(vs), hpad(ws), zpad(p),
                           rho0 / dt, z_offset=idx * nzl)[1:-1]
            zero = jnp.zeros_like(bt[0])
            bt = fix_shell(bt, jnp.stack([zero, zero]), first, last)
            p_new = pencil(bt)
            p_res = jnp.zeros((), dtype)
            p_ok = jnp.bool_(True)

        s_corr = (dt / rho0)[None]
        un = pk.corr_u(s_corr, zpad(us), zpad(p_new))[0][1:-1]
        vn = pk.corr_v(s_corr, zpad(vs), zpad(p_new))[0][1:-1]
        wn = pk.corr_w(s_corr, hpad(p_new), zpad(ws))[0][1:-1]
        un = fix_shell(un, us, first, last)
        vn = fix_shell(vn, vs, first, last)
        wn = fix_shell(wn, ws, first, last)
        return un, vn, wn, p_new, p_res, p_ok

    spec = P("z", None, None)
    smapped = jax.shard_map(
        local_step_dst if pk_dst is not None else local_step, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P(), P(), P(), P()),
        out_specs=(spec, spec, spec, spec, P(), P()),
        check_vma=False)

    def step(field: FlowField, dt, iter_idx):
        dt = jnp.asarray(dt, dtype)
        rho0 = field.rho[0, 0, 0]
        rho0 = jnp.where(rho0 < 1e-10, 1.0, rho0).astype(dtype)
        decay = jnp.exp(jnp.asarray(
            -params.source_decay_rate * iter_idx * dt, dtype))
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, p_res, p_ok = smapped(field.u, field.v, field.w,
                                          field.p, field.T,
                                          dt, rho0, su, sv)
        new_field = field.replace(u=u, v=v, w=w, p=p)

        # Energy + thermal BCs run as plain sharded jnp (GSPMD partitions
        # the advection-diffusion stencils; `solver_projection.c:256-268`).
        if energy_step is not None:
            T = energy_step(new_field.T, new_field.u, new_field.v,
                            new_field.w, dt, iter_idx * dt)
            new_field = new_field.replace(T=T)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6),
                           jnp.where(p_ok, jnp.int32(0), jnp.int32(-7)))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=p_res,
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def _make_fused_sharded_projection_zy_step(grid: Grid, params: NSParams,
                                           mesh: Mesh, dtype,
                                           interpret: bool,
                                           pz: int, py: int,
                                           poisson_method=None,
                                           poisson_params=None,
                                           spectral_precision=None):
    """3D fused projection over a 2D (z, y) device mesh — the pod-scale
    decomposition (z-only runs out of planes past nz/2 chips; SURVEY §2.9
    names the fresh multi-axis design as the TPU answer to the reference's
    missing MPI layer, `ROADMAP.md:88`).

    Each shard holds (nz/Pz, ny/Py, nx).  Kernels run in global-row mode
    (``ProjectionKernels(global_nz, global_ny)``): one halo plane per z
    side rides the 'z' ring, four halo rows per y side ride the 'y' ring
    (4 keeps the 8-row sublane alignment); y-padding runs first so the z
    ring carries the corner rows too.  In-plane shells fall out of the
    kernels' global-row masks; global z-shells are restored per edge
    z-shard (the reference's save/restore idiom).

    At qualifying shapes (`spectral.dst_fused_sharded_zy_supported`) the
    FFT_DIRECT solve runs the **DST-fused mega variant** (r5): the x DSTs
    — row-local under y decomposition — ride the ±2-window global-row
    mega kernels in-kernel (forward in the predictor, inverse on
    corrector window arrival, halo rings exchanged in x-transform
    space), and the only cross-shard stage is the four-``all_to_all``
    y/z spectral solve (`spectral.make_dst_fused_sharded_zy_pieces`).
    Otherwise the per-component kernels + two-axis pencil DST
    (`..solvers.poisson.spectral.make_btilde_pipeline_sharded_zy`) or
    the (z, y)-ring fused CG/BiCGSTAB run per ``poisson_method``.
    """
    from ..solvers.poisson.base import Method, PoissonParams

    nz, ny, nx = grid.nz, grid.ny, grid.nx
    nzl, nyl = nz // pz, ny // py

    from ..ops.pallas.projection_kernels import ProjectionKernels
    problem = PoissonProblem(nx, ny, nz, grid.dx0, grid.dy0, grid.dz0)

    # DST-fused mega variant on the 2D mesh (r5): the x DSTs are
    # row-local under y decomposition, so they ride the global-row mega
    # kernels in-kernel (forward in the ±2-window predictor, inverse on
    # corrector window arrival); the y/z spectral solve (four
    # all_to_alls around the dense y-eigen stage) is the only
    # cross-shard stage.  Falls back to the per-component kernels +
    # two-axis pencil DST when the shapes don't qualify.
    is_fft = (poisson_method is None
              or Method(poisson_method) == Method.FFT_DIRECT)
    pk_dst = yz_local = None
    if is_fft:
        from ..solvers.poisson.spectral import (
            dst_fused_sharded_zy_supported,
            make_dst_fused_sharded_zy_pieces)
        if dst_fused_sharded_zy_supported(problem, pz, py):
            mats_x, yz = make_dst_fused_sharded_zy_pieces(
                problem, pz, py, dtype=dtype,
                precision=(spectral_precision
                           or jax.lax.Precision.HIGHEST))
            pk_try = ProjectionKernels(
                nzl + 2, nyl + 8, nx, grid.dx0, grid.dy0, grid.dz0,
                grid.xmin, grid.ymin, dtype, emit="btilde",
                beta=params.beta, T_ref=params.T_ref,
                gravity=params.gravity, interpret=interpret,
                global_nz=nz, global_ny=ny, dst_mats=mats_x,
                dst_precision=spectral_precision)
            if pk_try.mega_ok:
                pk_dst, yz_local = pk_try, yz

    pk = None
    if pk_dst is None:
        pk = ProjectionKernels(nzl + 2, nyl + 8, nx, grid.dx0, grid.dy0,
                               grid.dz0, grid.xmin, grid.ymin, dtype,
                               beta=params.beta, T_ref=params.T_ref,
                               gravity=params.gravity,
                               interpret=interpret, global_nz=nz,
                               global_ny=ny)
        if not (pk.ok and pk.btilde_k is not None):
            raise ValueError("fused sharded zy projection: kernel build "
                             "failed")

    pencil = cg_local = None
    if poisson_method is not None and Method(poisson_method) == Method.CG:
        from .fused_cg import make_cg_fused_sharded_local
        cg_local = make_cg_fused_sharded_local(
            problem, poisson_params or PoissonParams(), pz,
            dtype=dtype, interpret=interpret, py=py)
        if cg_local is None:
            raise ValueError("fused sharded zy projection: CG kernel "
                             "build failed")
    elif (poisson_method is not None
          and Method(poisson_method) == Method.BICGSTAB):
        from .fused_bicgstab import make_bicgstab_fused_sharded_local
        cg_local = make_bicgstab_fused_sharded_local(
            problem, poisson_params or PoissonParams(), pz,
            dtype=dtype, interpret=interpret, py=py)
        if cg_local is None:
            raise ValueError("fused sharded zy projection: BiCGSTAB "
                             "kernel build failed")
    elif pk_dst is None:
        from ..solvers.poisson.spectral import \
            make_btilde_pipeline_sharded_zy
        pencil = make_btilde_pipeline_sharded_zy(
            problem, pz, py, dtype,
            precision=(spectral_precision or jax.lax.Precision.HIGHEST))
    energy_step = make_energy_step(grid, params.alpha,
                                   params.heat_source_func)

    fwd_z = [(i, i + 1) for i in range(pz - 1)]
    bwd_z = [(i + 1, i) for i in range(pz - 1)]
    fwd_y = [(i, i + 1) for i in range(py - 1)]
    bwd_y = [(i + 1, i) for i in range(py - 1)]

    def ypad(x):
        """(K, nyl, nx) → (K, nyl+8, nx): 4 edge rows per side from the y
        ring (edge shards get zeros — consumers mask on global row)."""
        if py == 1:
            return jnp.pad(x, ((0, 0), (4, 4), (0, 0)))
        lo = lax.ppermute(x[:, -4:], "y", fwd_y)
        hi = lax.ppermute(x[:, :4], "y", bwd_y)
        return jnp.concatenate([lo, x, hi], axis=1)

    def hpad(xp):
        """Halo-pad z on an already y-padded block via the z ring — the
        exchanged planes carry their y-halo rows, so corners arrive from
        the diagonal shard in two hops."""
        if pz == 1:
            return jnp.pad(xp, ((1, 1), (0, 0), (0, 0)))
        lo = lax.ppermute(xp[-1:], "z", fwd_z)
        hi = lax.ppermute(xp[:1], "z", bwd_z)
        return jnp.concatenate([lo, xp, hi], axis=0)

    def hpad2(xp):
        """±2-plane z halo pad on an already y-padded block (the mega
        predictor's 5-plane windows); the exchanged planes carry their
        y-halo rows, so corners arrive from the diagonal shard."""
        if pz == 1:
            return jnp.pad(xp, ((2, 2), (0, 0), (0, 0)))
        lo = lax.ppermute(xp[-2:], "z", fwd_z)
        hi = lax.ppermute(xp[:2], "z", bwd_z)
        return jnp.concatenate([lo, xp, hi], axis=0)

    def zpad(xp, n=1):
        """Zero-pad plane-only inputs (their pad planes are never read)."""
        return jnp.pad(xp, ((n, n), (0, 0), (0, 0)))

    def y0pad(x):
        """Zero y-halo rows for inputs consumed pointwise at owned rows
        only (no ring traffic needed — shape alignment only)."""
        return jnp.pad(x, ((0, 0), (4, 4), (0, 0)))

    def unpad(o):
        return o[1:-1, 4:-4]

    def fix_shell(out, shell_src, first, last):
        """Restore global z-shell planes (reference save/restore idiom)."""
        out = out.at[0].set(jnp.where(first, shell_src[0], out[0]))
        out = out.at[-1].set(jnp.where(last, shell_src[-1], out[-1]))
        return out

    def local_step_dst(u, v, w, p, T, dt, rho0, su_amp, sv_amp):
        """DST-fused mega variant on the (z, y) mesh: two marching
        kernels (in-kernel x transforms, global-row structure) around the
        four-all_to_all y/z spectral solve."""
        zi = lax.axis_index("z")
        first = zi == 0
        last = zi == pz - 1
        yi = lax.axis_index("y")
        z_off = (zi * nzl).astype(dtype)
        y_off = (yi * nyl - 4).astype(dtype)

        eT = ({"T": hpad2(ypad(T.astype(dtype)))}
              if pk_dst.buoyant else {})
        outs = pk_dst.predictor_poisson_input(
            hpad2(ypad(u)), hpad2(ypad(v)), hpad2(ypad(w)),
            zpad(y0pad(p), 2), dt, jnp.asarray(params.mu, dtype),
            su_amp, sv_amp, rho0 / dt, z_offset=z_off, y_offset=y_off,
            **eT)
        us, vs, ws, bt = [o[2:-2, 4:-4] for o in outs]
        us = fix_shell(us, u, first, last)
        vs = fix_shell(vs, v, first, last)
        ws = fix_shell(ws, w, first, last)
        # zero the global z-shell b̃ planes — x-transform-space zeroing
        # is exact (the x DST is linear and row-local)
        zero = jnp.zeros_like(bt[0])
        bt = fix_shell(bt, jnp.stack([zero, zero]), first, last)

        xhat = yz_local(bt)
        # x̂ halos (1 z plane, 4 y rows) exchanged in x-TRANSFORM space —
        # the corrector's arrival hook inverse-x-DSTs each padded plane
        # exactly once.  The y/z solve already placed the global mirror
        # shells on the edge shards' owned rows/planes, so p needs no
        # wrapper fix; the star inputs are consumed pointwise at owned
        # rows, so their y halos stay zero.
        outs = pk_dst.corrector_diag(
            zpad(y0pad(us)), zpad(y0pad(vs)), zpad(y0pad(ws)),
            hpad(ypad(xhat)), dt / rho0, y_offset=y_off)
        un, vn, wn, p_new = [o[1:-1, 4:-4] for o in outs]
        un = fix_shell(un, us, first, last)
        vn = fix_shell(vn, vs, first, last)
        wn = fix_shell(wn, ws, first, last)
        return un, vn, wn, p_new, jnp.zeros((), dtype), jnp.bool_(True)

    def local_step(u, v, w, p, T, dt, rho0, su_amp, sv_amp):
        zi = lax.axis_index("z")
        first = zi == 0
        last = zi == pz - 1
        yi = lax.axis_index("y")
        y_off = (yi * nyl - 4).astype(dtype)

        s_pred = jnp.stack([dt, jnp.asarray(params.mu, dtype),
                            su_amp, sv_amp, y_off])
        up, vp, wp = ypad(u), ypad(v), ypad(w)
        eT = (zpad(ypad(T.astype(dtype))),) if pk.buoyant else ()
        us = unpad(pk.pred_u(s_pred, hpad(up), zpad(vp), zpad(wp), *eT)[0])
        vs = unpad(pk.pred_v(s_pred, hpad(vp), zpad(up), zpad(wp), *eT)[0])
        ws = unpad(pk.pred_w(s_pred, hpad(wp), zpad(up), zpad(vp), *eT)[0])
        us = fix_shell(us, u, first, last)
        vs = fix_shell(vs, v, first, last)
        ws = fix_shell(ws, w, first, last)

        if cg_local is not None:
            (rhs_pad,) = pk.divergence(jnp.stack([rho0 / dt, y_off]),
                                       hpad(ypad(ws)), zpad(ypad(us)),
                                       zpad(ypad(vs)))
            rhs_loc = unpad(rhs_pad)
            zero = jnp.zeros_like(rhs_loc[0])
            rhs_loc = fix_shell(rhs_loc, jnp.stack([zero, zero]),
                                first, last)
            pres = cg_local(p, rhs_loc)
            p_new = pres.x
            p_res = pres.final_residual
            p_ok = pres.status == 0
        else:
            bt = unpad(pk.btilde(zpad(ypad(us)), zpad(ypad(vs)),
                                 hpad(ypad(ws)), zpad(ypad(p)),
                                 rho0 / dt, z_offset=zi * nzl,
                                 y_offset=y_off))
            zero = jnp.zeros_like(bt[0])
            bt = fix_shell(bt, jnp.stack([zero, zero]), first, last)
            p_new = pencil(bt)
            p_res = jnp.zeros((), dtype)
            p_ok = jnp.bool_(True)

        s_corr = jnp.stack([dt / rho0, y_off])
        pnp = ypad(p_new)
        un = unpad(pk.corr_u(s_corr, zpad(ypad(us)), zpad(pnp))[0])
        vn = unpad(pk.corr_v(s_corr, zpad(ypad(vs)), zpad(pnp))[0])
        wn = unpad(pk.corr_w(s_corr, hpad(pnp), zpad(ypad(ws)))[0])
        un = fix_shell(un, us, first, last)
        vn = fix_shell(vn, vs, first, last)
        wn = fix_shell(wn, ws, first, last)
        return un, vn, wn, p_new, p_res, p_ok

    spec = P("z", "y", None)
    smapped = jax.shard_map(
        local_step_dst if pk_dst is not None else local_step, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P(), P(), P(), P()),
        out_specs=(spec, spec, spec, spec, P(), P()),
        check_vma=False)

    def step(field: FlowField, dt, iter_idx):
        dt = jnp.asarray(dt, dtype)
        rho0 = field.rho[0, 0, 0]
        rho0 = jnp.where(rho0 < 1e-10, 1.0, rho0).astype(dtype)
        decay = jnp.exp(jnp.asarray(
            -params.source_decay_rate * iter_idx * dt, dtype))
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, p_res, p_ok = smapped(field.u, field.v, field.w,
                                          field.p, field.T,
                                          dt, rho0, su, sv)
        new_field = field.replace(u=u, v=v, w=w, p=p)

        if energy_step is not None:
            T = energy_step(new_field.T, new_field.u, new_field.v,
                            new_field.w, dt, iter_idx * dt)
            new_field = new_field.replace(T=T)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6),
                           jnp.where(p_ok, jnp.int32(0), jnp.int32(-7)))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=p_res,
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def _make_fused_sharded_projection2d_step(grid: Grid, params: NSParams,
                                          mesh: Mesh, dtype,
                                          poisson_method, interpret,
                                          spectral_precision=None):
    """2D fused shard_map projection: y-decomposition feeding the
    block-marching kernels (`ops/pallas/projection2d.py` in global-row
    mode) + the 1D-pencil distributed DST
    (`..solvers.poisson.spectral.make_btilde_pipeline_sharded_2d`).

    Each shard holds (1, ny/P, nx); four edge rows per side ride ring
    ``ppermute``s so the ±2-row predictor+divergence window sees the
    neighbor shard's rows while the local block stays 8-row aligned.  The
    marching kernels where-select every boundary row from the global row
    index, so no shell fix-up pass is needed — the reference's
    save/restore idiom falls out of the masks.  The reference's published
    perf configs are 2D (`README.md:225-231`); this is their multi-chip
    fast path.
    """
    from ..solvers.poisson.base import Method, PoissonProblem
    from ..solvers.poisson.spectral import make_btilde_pipeline_sharded_2d
    from ..ops.pallas.projection2d import Projection2DKernels

    if poisson_method is not None \
            and Method(poisson_method) != Method.FFT_DIRECT:
        raise ValueError("fused sharded 2D projection supports the "
                         "FFT_DIRECT pressure solve only")
    ny, nx = grid.ny, grid.nx
    n_shards = _mesh_y_size(mesh)
    nyl = ny // n_shards

    kern_kwargs = dict(
        with_sources=(params.source_amplitude_u != 0.0
                      or params.source_amplitude_v != 0.0),
        beta=params.beta, T_ref=params.T_ref, gravity=params.gravity,
        interpret=interpret, global_ny=ny)
    problem = PoissonProblem(nx, ny, 1, grid.dx0, grid.dy0, 0.0)

    # DST-fused variant (r5, mirroring the 3D z-sharded structure): the
    # x DSTs are row-local under y decomposition, so they stay inside
    # the per-shard marching kernels (forward in the predictor, inverse
    # on DMA arrival in the corrector); the 4-row halo rings exchange
    # TRANSFORM-space pressure (the x transform commutes with the
    # row-wise halo copy) and the per-slab y-eigen solve around two
    # x-mode-pencil all_to_alls is the only cross-shard stage.
    pk = ysolve = None
    from ..solvers.poisson.spectral import (
        dst2d_fused_sharded_supported, make_dst2d_fused_sharded_pieces)
    if dst2d_fused_sharded_supported(problem, n_shards):
        fxT, gxT, ysv = make_dst2d_fused_sharded_pieces(
            problem, n_shards, "y", dtype, interpret=interpret,
            precision=(spectral_precision or jax.lax.Precision.HIGHEST))
        pk_try = Projection2DKernels(
            nyl + 8, nx, grid.dx0, grid.dy0, grid.xmin, grid.ymin,
            dtype, emit="btilde", dst_mats=(fxT, gxT),
            dst_precision=spectral_precision, **kern_kwargs)
        if pk_try.ok:
            pk, ysolve = pk_try, ysv
    if pk is None:
        pk = Projection2DKernels(
            nyl + 8, nx, grid.dx0, grid.dy0, grid.xmin, grid.ymin, dtype,
            emit="btilde", **kern_kwargs)
        if not pk.ok:
            raise ValueError("fused sharded 2D projection: kernel build "
                             "failed")

    pencil = (ysolve if ysolve is not None
              else make_btilde_pipeline_sharded_2d(problem, "y", n_shards,
                                                   dtype))
    energy_step = make_energy_step(grid, params.alpha,
                                   params.heat_source_func)

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    def hpad4(x):
        """(1, nyl, nx) → (1, nyl+8, nx): four real edge rows per side from
        the ring neighbors (edge shards get zeros — every consumer
        where-selects on the global row index)."""
        if n_shards == 1:
            return jnp.pad(x, ((0, 0), (4, 4), (0, 0)))
        lo = lax.ppermute(x[:, -4:], "y", fwd)
        hi = lax.ppermute(x[:, :4], "y", bwd)
        return jnp.concatenate([lo, x, hi], axis=1)

    def local_step(u, v, w, p, T, dt, rho0, su_amp, sv_amp):
        idx = lax.axis_index("y")
        y_off = idx * nyl - 4   # global row of padded row 0

        us, vs, ws, bt = pk.predictor_and_poisson_input(
            hpad4(u), hpad4(v), hpad4(w), hpad4(p), dt, params.mu,
            su_amp, sv_amp, rho0 / dt, y_offset=y_off,
            T=hpad4(T) if pk.buoyant else None)
        us, vs, ws = (a[:, 4:-4] for a in (us, vs, ws))
        bt = bt[:, 4:-4]

        p_new = pencil(bt)

        if pk.dst:
            # p_new is the y-solve output x̂ (transform space): the halo
            # ring exchanges x̂ rows (the row-wise x transform commutes
            # with the copy) and the corrector inverse-transforms blocks
            # on arrival, emitting physical p as a third output.
            un, vn, pn = pk.corrector(hpad4(us), hpad4(vs), hpad4(p_new),
                                      dt / rho0, y_offset=y_off)
            p_new = pn[:, 4:-4]
        else:
            un, vn = pk.corrector(hpad4(us), hpad4(vs), hpad4(p_new),
                                  dt / rho0, y_offset=y_off)
        un = un[:, 4:-4]
        vn = vn[:, 4:-4]
        # w-correction is identically zero in 2D (inv_dz2 = 0).
        return un, vn, ws, p_new

    spec = P(None, "y", None)
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, P(), P(), P(), P()),
        out_specs=(spec, spec, spec, spec),
        check_vma=False)

    def step(field: FlowField, dt, iter_idx):
        dt = jnp.asarray(dt, dtype)
        rho0 = field.rho[0, 0, 0]
        rho0 = jnp.where(rho0 < 1e-10, 1.0, rho0).astype(dtype)
        decay = jnp.exp(jnp.asarray(
            -params.source_decay_rate * iter_idx * dt, dtype))
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p = smapped(field.u, field.v, field.w, field.p, field.T,
                             dt, rho0, su, sv)
        new_field = field.replace(u=u, v=v, w=w, p=p)

        if energy_step is not None:
            T = energy_step(new_field.T, new_field.u, new_field.v,
                            new_field.w, dt, iter_idx * dt)
            new_field = new_field.replace(T=T)
        if params.energy_enabled:
            new_field = new_field.replace(
                T=apply_thermal_bcs(new_field.T, params.thermal_bc))

        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6), jnp.int32(0))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=jnp.zeros((), dtype),
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def fused_sharded_euler_unsupported_reason(grid: Grid, params: NSParams,
                                           mesh: Mesh, dtype) -> str | None:
    """None when the fused shard_map Euler path applies, else a reason."""
    from ..ops.pallas.euler_kernels import euler_kernel_supported

    if dtype != jnp.float32:
        return f"fused kernels are float32-only (got {dtype})"
    if grid.nz <= 2:
        # 2D path: y-decomposition feeding the marching kernel.
        from ..ops.pallas.euler2d import euler2d_supported

        n = _mesh_y_size(mesh)
        if n is None:
            return ("fused sharded 2D euler needs a y-only mesh "
                    f"(got axes {dict(mesh.shape)})")
        sreason = _stretch_reason_2d(grid, params)
        if sreason is not None:
            return sreason
        if grid.ny % n != 0 or grid.ny // n < 24:
            return (f"ny={grid.ny} must be divisible by {n} shards with "
                    ">= 24 rows per shard")
        from ..solvers.ns.common import stretch_pin_count
        if not euler2d_supported(grid.ny // n + 8, grid.nx,
                                 stretch_pin_count(grid, params)):
            return (f"local block ({grid.ny // n}+8, {grid.nx}) outside "
                    "block-marching support (nx%128, rows%8, VMEM)")
        if (params.source_func is not None
                or params.heat_source_func is not None):
            return "custom source callables use the jnp path"
        return None
    sizes = _mesh_zy_sizes(mesh)
    if sizes is None:
        return ("fused sharded euler needs a mesh over ('z'[, 'y']) axes "
                f"(got axes {dict(mesh.shape)})")
    pz, py = sizes
    if grid.nz % pz != 0 or grid.nz // pz < 3:
        return (f"nz={grid.nz} must be divisible by {pz} shards with >= 3 "
                "planes per shard")
    from ..solvers.ns.common import stretch_pin_count
    if py > 1:
        nyl = grid.ny // py
        if grid.ny % py != 0 or nyl < 8 or nyl % 8 != 0:
            return (f"ny={grid.ny} must be divisible by {py} y-shards "
                    "with a multiple of 8 (>= 8) rows per shard")
        if not euler_kernel_supported(grid.nz // pz + 2, nyl + 8, grid.nx,
                                      stretch_pin_count(grid, params)):
            return (f"local block ({grid.nz // pz}+2, {nyl}+8, {grid.nx}) "
                    "outside rolling-kernel support (nx%128, VMEM)")
    else:
        if not euler_kernel_supported(grid.nz // pz + 2, grid.ny, grid.nx,
                                      stretch_pin_count(grid, params)):
            return (f"local block ({grid.nz // pz}+2, {grid.ny}, {grid.nx}) "
                    "outside rolling-kernel support (nx%128, ny%8, VMEM)")
    reason = _stretch_reason(grid, params)
    if reason is not None:
        return reason
    if params.source_func is not None or params.heat_source_func is not None:
        return "custom source callables use the jnp path"
    return None


def make_fused_sharded_euler_step(grid: Grid, params: NSParams, mesh: Mesh,
                                  dtype=jnp.float32,
                                  interpret: bool = None):
    """Z-sharded fused Euler step: each shard runs the single-pass rolling
    kernel on its halo-padded block (ring `ppermute` halos), then the
    GLOBAL boundary dance is restored across shards — velocity shells from
    the input (save/restore idiom), p/rho/T shells from the periodic wrap,
    whose source planes live on the OPPOSITE edge shard and ride one more
    ppermute each.  The multi-chip replacement for the reference's missing
    MPI layer, extended from the projection path to the Euler integrator.
    """
    reason = fused_sharded_euler_unsupported_reason(grid, params, mesh,
                                                    dtype)
    if reason is not None:
        raise ValueError(f"fused sharded euler unsupported: {reason}")
    validate_grid_for_solver(grid, grid.shape)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    nz, ny, nx = grid.nz, grid.ny, grid.nx
    if nz <= 2:
        return _make_fused_sharded_euler_2d_step(grid, params, mesh,
                                                 dtype, interpret)
    pz, py = _mesh_zy_sizes(mesh)
    if py > 1:
        return _make_fused_sharded_euler_zy_step(
            grid, params, mesh, dtype, interpret, pz, py)
    n_shards = pz
    nzl = nz // n_shards

    from ..ops.pallas.euler_kernels import make_euler_fused
    kernel = make_euler_fused(
        nzl + 2, ny, nx, grid.dx0, grid.dy0, grid.dz0,
        grid.xmin, grid.ymin, params.mu, params.pressure_coupling,
        alpha=params.alpha, beta=params.beta, T_ref=params.T_ref,
        gravity=params.gravity, thermal_bc=params.thermal_bc,
        stretch=_stretch_tuple(grid, params), scheme=params.nonuniform_scheme,
        dtype=dtype, interpret=interpret)
    if kernel is None:
        raise ValueError("fused sharded euler: kernel build failed")

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    def hpad(x):
        if n_shards == 1:
            return jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
        lo = lax.ppermute(x[-1:], "z", fwd)
        hi = lax.ppermute(x[:1], "z", bwd)
        return jnp.concatenate([lo, x, hi], axis=0)

    def fix_vel_shell(out, src, first, last):
        """Global velocity shells restore the caller's input planes."""
        out = out.at[0].set(jnp.where(first, src[0], out[0]))
        out = out.at[-1].set(jnp.where(last, src[-1], out[-1]))
        return out

    def wrap_z_shell(out, first, last, zspec=("periodic", "periodic")):
        """Global z-shell restore per face: "periodic" (cross-shard wrap),
        "neumann" (adjacent interior plane, local to the edge shard), or a
        float Dirichlet constant — the thermal z-face semantics."""
        lo_spec, hi_spec = zspec
        if lo_spec == "periodic":
            if n_shards == 1:
                src_lo = out[nzl - 2:nzl - 1]
            else:
                src_lo = lax.ppermute(out[nzl - 2:nzl - 1], "z",
                                      [(n_shards - 1, 0)])
        elif lo_spec == "neumann":
            src_lo = out[1:2]
        else:
            src_lo = jnp.full_like(out[0:1], lo_spec)
        if hi_spec == "periodic":
            if n_shards == 1:
                src_hi = out[1:2]
            else:
                src_hi = lax.ppermute(out[1:2], "z", [(0, n_shards - 1)])
        elif hi_spec == "neumann":
            src_hi = out[nzl - 2:nzl - 1]
        else:
            src_hi = jnp.full_like(out[0:1], hi_spec)
        out = out.at[0:1].set(jnp.where(first, src_lo, out[0:1]))
        out = out.at[nzl - 1:nzl].set(jnp.where(last, src_hi,
                                                out[nzl - 1:nzl]))
        return out

    t_zspec = ("periodic", "periodic")
    if params.energy_enabled:
        from ..boundary.types import thermal_z_specs
        t_zspec = thermal_z_specs(params.thermal_bc)

    def local_step(u, v, w, p, rho, T, cdt, su, sv, t):
        idx = lax.axis_index("z")
        first = idx == 0
        last = idx == n_shards - 1

        scal = jnp.stack([cdt, su, sv, t])
        outs = kernel(scal, hpad(u), hpad(v), hpad(w), hpad(p), hpad(T),
                      jnp.pad(rho, ((1, 1), (0, 0), (0, 0))))
        un, vn, wn, pn, rn, Tn = (o[1:-1] for o in outs[:6])
        un = fix_vel_shell(un, u, first, last)
        vn = fix_vel_shell(vn, v, first, last)
        wn = fix_vel_shell(wn, w, first, last)
        pn = wrap_z_shell(pn, first, last)
        rn = wrap_z_shell(rn, first, last)
        Tn = wrap_z_shell(Tn, first, last, t_zspec)
        return un, vn, wn, pn, rn, Tn

    spec = P("z", None, None)
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec,) * 6 + (P(), P(), P(), P()),
        out_specs=(spec,) * 6,
        check_vma=False)

    from ..solvers.ns.params import DT_CONSERVATIVE_LIMIT

    def step(field: FlowField, dt, iter_idx):
        cdt = jnp.minimum(jnp.asarray(dt, dtype),
                          jnp.asarray(DT_CONSERVATIVE_LIMIT, dtype))
        t = jnp.asarray(iter_idx, dtype) * cdt
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, rho, T = smapped(field.u, field.v, field.w, field.p,
                                     field.rho, field.T, cdt, su, sv, t)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6), jnp.int32(0))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=jnp.zeros((), dtype),
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def _make_fused_sharded_euler_2d_step(grid: Grid, params: NSParams,
                                      mesh: Mesh, dtype, interpret: bool):
    """2D fused shard_map Euler: y-decomposition feeding the single-pass
    marching kernel (`ops/pallas/euler2d.py` in global-row mode) — the 2D
    sibling of the fused sharded 2D projection, covering the reference's
    published 2D explicit-Euler configs multi-chip
    (`README.md:225-231`).  Four edge rows per side ride ring
    ``ppermute``s; the global y-face rows of p/rho/T (and T's thermal
    bottom/top) ride edge-to-edge ppermutes post-kernel; velocity faces
    keep the caller's input via the kernel's global-row interior mask."""
    ny, nx = grid.ny, grid.nx
    n_shards = _mesh_y_size(mesh)
    nyl = ny // n_shards

    from ..ops.pallas.euler2d import make_euler2d_fused
    kernel = make_euler2d_fused(
        nyl + 8, nx, grid.dx0, grid.dy0, grid.xmin, grid.ymin,
        params.mu, params.pressure_coupling, alpha=params.alpha,
        beta=params.beta, T_ref=params.T_ref, gravity=params.gravity,
        thermal_bc=params.thermal_bc, stretch=_stretch_tuple(grid, params),
        scheme=params.nonuniform_scheme, dtype=dtype, interpret=interpret,
        global_ny=ny)
    if kernel is None:
        raise ValueError("fused sharded 2D euler: kernel build failed")
    stretch_fn = _stretch_inputs_2d_fn(grid, params, nyl, dtype)

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    def hpad4(x):
        """(1, nyl, nx) → (1, nyl+8, nx): four edge rows per side (edge
        shards get zeros — every consumer keys on the global row)."""
        if n_shards == 1:
            return jnp.pad(x, ((0, 0), (4, 4), (0, 0)))
        lo = lax.ppermute(x[:, -4:], "y", fwd)
        hi = lax.ppermute(x[:, :4], "y", bwd)
        return jnp.concatenate([lo, x, hi], axis=1)

    def wrap_y_rows(out, firsty, lasty, yspec=("periodic", "periodic")):
        """Global y-face rows: "periodic" (cross-shard wrap), "neumann"
        (adjacent interior row), or a float Dirichlet constant."""
        lo_spec, hi_spec = yspec
        if lo_spec == "periodic":
            src_lo = out[:, nyl - 2:nyl - 1] if n_shards == 1 else \
                lax.ppermute(out[:, nyl - 2:nyl - 1], "y",
                             [(n_shards - 1, 0)])
        elif lo_spec == "neumann":
            src_lo = out[:, 1:2]
        else:
            src_lo = jnp.full_like(out[:, 0:1], lo_spec)
        if hi_spec == "periodic":
            src_hi = out[:, 1:2] if n_shards == 1 else \
                lax.ppermute(out[:, 1:2], "y", [(0, n_shards - 1)])
        elif hi_spec == "neumann":
            src_hi = out[:, nyl - 2:nyl - 1]
        else:
            src_hi = jnp.full_like(out[:, 0:1], hi_spec)
        out = out.at[:, 0:1].set(jnp.where(firsty, src_lo, out[:, 0:1]))
        out = out.at[:, nyl - 1:nyl].set(
            jnp.where(lasty, src_hi, out[:, nyl - 1:nyl]))
        return out

    t_yspec = ("periodic", "periodic")
    if params.energy_enabled:
        from ..boundary.types import thermal_y_specs
        t_yspec = thermal_y_specs(params.thermal_bc)

    def local_step(u, v, w, p, rho, T, cdt, su, sv):
        yi = lax.axis_index("y")
        firsty = yi == 0
        lasty = yi == n_shards - 1
        y_off = (yi * nyl - 4).astype(dtype)

        scal = jnp.stack([cdt, su, sv, y_off])
        extra = ()
        if stretch_fn is not None:
            yps, xrows = stretch_fn(yi)
            extra = (*yps, xrows)
        outs = kernel(scal, hpad4(u)[0], hpad4(v)[0], hpad4(w)[0],
                      hpad4(p)[0], hpad4(T)[0], hpad4(rho)[0], *extra)
        un, vn, wn, pn, rn, Tn = (o[None, 4:-4] for o in outs)
        pn = wrap_y_rows(pn, firsty, lasty)
        rn = wrap_y_rows(rn, firsty, lasty)
        Tn = wrap_y_rows(Tn, firsty, lasty, t_yspec)
        return un, vn, wn, pn, rn, Tn

    spec = P(None, "y", None)
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec,) * 6 + (P(), P(), P()),
        out_specs=(spec,) * 6,
        check_vma=False)

    from ..solvers.ns.params import DT_CONSERVATIVE_LIMIT

    def step(field: FlowField, dt, iter_idx):
        cdt = jnp.minimum(jnp.asarray(dt, dtype),
                          jnp.asarray(DT_CONSERVATIVE_LIMIT, dtype))
        t = jnp.asarray(iter_idx, dtype) * cdt
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, rho, T = smapped(field.u, field.v, field.w, field.p,
                                     field.rho, field.T, cdt, su, sv)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6), jnp.int32(0))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=jnp.zeros((), dtype),
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def _make_fused_sharded_euler_zy_step(grid: Grid, params: NSParams,
                                      mesh: Mesh, dtype, interpret: bool,
                                      pz: int, py: int):
    """Fused Euler over a 2D (z, y) device mesh — the pod-scale
    decomposition, following the zy projection design
    (`_make_fused_sharded_projection_zy_step`): global-row-mode kernel
    (``make_euler_fused(global_ny=...)``), four halo rows per y side, one
    halo plane per z side, y-padding first so the z ring carries corner
    rows.  The global boundary dance is restored post-kernel in reference
    order x → y → z (later faces own corners,
    `core_impl.h:92-120`): x faces wrap in-kernel; y-face rows of p/rho/T
    (and T's thermal y faces) ride edge-to-edge y ppermutes; z-face
    planes ride edge-to-edge z ppermutes reading the y-fixed planes.
    Velocity shells keep the caller's input everywhere (save/restore
    idiom): x/y faces via the kernel's global-row interior mask, z faces
    via the per-edge-shard restore."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    nzl, nyl = nz // pz, ny // py

    from ..ops.pallas.euler_kernels import make_euler_fused
    kernel = make_euler_fused(
        nzl + 2, nyl + 8, nx, grid.dx0, grid.dy0, grid.dz0,
        grid.xmin, grid.ymin, params.mu, params.pressure_coupling,
        alpha=params.alpha, beta=params.beta, T_ref=params.T_ref,
        gravity=params.gravity, thermal_bc=params.thermal_bc,
        stretch=_stretch_tuple(grid, params),
        scheme=params.nonuniform_scheme,
        dtype=dtype, interpret=interpret, global_ny=ny)
    if kernel is None:
        raise ValueError("fused sharded zy euler: kernel build failed")
    pins_fn = _stretch_pins_zy_fn(grid, params, nyl, dtype)

    ypad, hpad, unpad, wrap_y_rows, wrap_z_shell = \
        _zy_halo_helpers(nzl, nyl, pz, py)

    def fix_vel_shell(out, src, first, last):
        """Global z velocity shells restore the caller's input planes."""
        out = out.at[0].set(jnp.where(first, src[0], out[0]))
        out = out.at[-1].set(jnp.where(last, src[-1], out[-1]))
        return out

    t_yspec = ("periodic", "periodic")
    t_zspec = ("periodic", "periodic")
    if params.energy_enabled:
        from ..boundary.types import thermal_y_specs, thermal_z_specs
        t_yspec = thermal_y_specs(params.thermal_bc)
        t_zspec = thermal_z_specs(params.thermal_bc)

    def local_step(u, v, w, p, rho, T, cdt, su, sv, t):
        zi = lax.axis_index("z")
        first = zi == 0
        last = zi == pz - 1
        yi = lax.axis_index("y")
        firsty = yi == 0
        lasty = yi == py - 1
        y_off = (yi * nyl - 4).astype(dtype)

        scal = jnp.stack([cdt, su, sv, t, y_off])
        pins_loc = () if pins_fn is None else tuple(pins_fn(yi))
        outs = kernel(scal, hpad(ypad(u)), hpad(ypad(v)), hpad(ypad(w)),
                      hpad(ypad(p)), hpad(ypad(T)),
                      jnp.pad(rho, ((1, 1), (4, 4), (0, 0))),
                      *pins_loc)
        un, vn, wn, pn, rn, Tn = (unpad(o) for o in outs[:6])
        # x faces wrapped in-kernel; y rows, then z planes (corner owners)
        pn = wrap_y_rows(pn, firsty, lasty)
        rn = wrap_y_rows(rn, firsty, lasty)
        Tn = wrap_y_rows(Tn, firsty, lasty, t_yspec)
        un = fix_vel_shell(un, u, first, last)
        vn = fix_vel_shell(vn, v, first, last)
        wn = fix_vel_shell(wn, w, first, last)
        pn = wrap_z_shell(pn, first, last)
        rn = wrap_z_shell(rn, first, last)
        Tn = wrap_z_shell(Tn, first, last, t_zspec)
        return un, vn, wn, pn, rn, Tn

    spec = P("z", "y", None)
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec,) * 6 + (P(), P(), P(), P()),
        out_specs=(spec,) * 6,
        check_vma=False)

    from ..solvers.ns.params import DT_CONSERVATIVE_LIMIT

    def step(field: FlowField, dt, iter_idx):
        cdt = jnp.minimum(jnp.asarray(dt, dtype),
                          jnp.asarray(DT_CONSERVATIVE_LIMIT, dtype))
        t = jnp.asarray(iter_idx, dtype) * cdt
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, rho, T = smapped(field.u, field.v, field.w, field.p,
                                     field.rho, field.T, cdt, su, sv, t)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6), jnp.int32(0))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=jnp.zeros((), dtype),
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def fused_sharded_rk_unsupported_reason(grid: Grid, params: NSParams,
                                        mesh: Mesh, dtype) -> str | None:
    """None when the fused shard_map RK path applies, else a reason."""
    from ..ops.pallas.rk_kernels import rk_kernel_supported

    if dtype != jnp.float32:
        return f"fused kernels are float32-only (got {dtype})"
    if grid.nz <= 2:
        # 2D path: y-decomposition feeding the marching stage kernels.
        from ..ops.pallas.rk2d import rk2d_supported

        n = _mesh_y_size(mesh)
        if n is None:
            return ("fused sharded 2D rk needs a y-only mesh "
                    f"(got axes {dict(mesh.shape)})")
        sreason = _stretch_reason_2d(grid, params)
        if sreason is not None:
            return sreason
        if grid.ny % n != 0 or grid.ny // n < 24:
            return (f"ny={grid.ny} must be divisible by {n} shards with "
                    ">= 24 rows per shard")
        from ..solvers.ns.common import stretch_pin_count
        if not rk2d_supported(grid.ny // n + 8, grid.nx,
                              stretch_pin_count(grid, params)):
            return (f"local block ({grid.ny // n}+8, {grid.nx}) outside "
                    "block-marching support (nx%128, rows%8, VMEM)")
        if (params.source_func is not None
                or params.heat_source_func is not None):
            return "custom source callables use the jnp path"
        return None
    sizes = _mesh_zy_sizes(mesh)
    if sizes is None:
        return ("fused sharded rk needs a mesh over ('z'[, 'y']) axes "
                f"(got axes {dict(mesh.shape)})")
    pz, py = sizes
    if grid.nz % pz != 0 or grid.nz // pz < 3:
        return (f"nz={grid.nz} must be divisible by {pz} shards with >= 3 "
                "planes per shard")
    from ..solvers.ns.common import stretch_pin_count
    if py > 1:
        nyl = grid.ny // py
        if grid.ny % py != 0 or nyl < 8 or nyl % 8 != 0:
            return (f"ny={grid.ny} must be divisible by {py} y-shards "
                    "with a multiple of 8 (>= 8) rows per shard")
        if not rk_kernel_supported(grid.nz // pz + 2, nyl + 8, grid.nx,
                                   stretch_pin_count(grid, params)):
            return (f"local block ({grid.nz // pz}+2, {nyl}+8, {grid.nx}) "
                    "outside rolling-kernel support (nx%128, VMEM)")
    else:
        if not rk_kernel_supported(grid.nz // pz + 2, grid.ny, grid.nx,
                                   stretch_pin_count(grid, params)):
            return (f"local block ({grid.nz // pz}+2, {grid.ny}, {grid.nx}) "
                    "outside rolling-kernel support (nx%128, ny%8, VMEM)")
    reason = _stretch_reason(grid, params)
    if reason is not None:
        return reason
    if params.source_func is not None or params.heat_source_func is not None:
        return "custom source callables use the jnp path"
    return None


def make_fused_sharded_rk_step(grid: Grid, params: NSParams, mesh: Mesh,
                               order: int, dtype=jnp.float32,
                               interpret: bool = None):
    """Z-sharded fused RK2/RK4: one shard_map stage-kernel pass per Butcher
    stage.  Halo planes ride ring ppermutes; the periodic-interior z-wrap
    pins (global planes nz−2 and 1 of each stage state) ride edge-to-edge
    ppermutes; the final stage's global periodic shells are restored the
    same way as the fused sharded Euler."""
    reason = fused_sharded_rk_unsupported_reason(grid, params, mesh, dtype)
    if reason is not None:
        raise ValueError(f"fused sharded rk unsupported: {reason}")
    validate_grid_for_solver(grid, grid.shape)
    if params.energy_enabled:
        validate_thermal_bc(params.thermal_bc, grid)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    nz, ny, nx = grid.nz, grid.ny, grid.nx
    if nz <= 2:
        return _make_fused_sharded_rk_2d_step(grid, params, mesh, order,
                                              dtype, interpret)
    pz, py = _mesh_zy_sizes(mesh)
    if py > 1:
        return _make_fused_sharded_rk_zy_step(
            grid, params, mesh, order, dtype, interpret, pz, py)
    n_shards = pz
    nzl = nz // n_shards

    from ..ops.pallas.rk_kernels import make_rk_stage
    thermal_kw = dict(alpha=params.alpha, beta=params.beta,
                      T_ref=params.T_ref, gravity=params.gravity,
                      thermal_bc=params.thermal_bc,
                      stretch=_stretch_tuple(grid, params),
                      scheme=params.nonuniform_scheme)
    mid = make_rk_stage(nzl + 2, ny, nx, grid.dx0, grid.dy0, grid.dz0,
                        grid.xmin, grid.ymin, params.mu,
                        params.pressure_coupling, final=False,
                        global_nz=nz, dtype=dtype, interpret=interpret,
                        **thermal_kw)
    fin = make_rk_stage(nzl + 2, ny, nx, grid.dx0, grid.dy0, grid.dz0,
                        grid.xmin, grid.ymin, params.mu,
                        params.pressure_coupling, final=True,
                        global_nz=nz, dtype=dtype, interpret=interpret,
                        **thermal_kw)
    if mid is None or fin is None:
        raise ValueError("fused sharded rk: kernel build failed")

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    def hpad(x):
        if n_shards == 1:
            return jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
        lo = lax.ppermute(x[-1:], "z", fwd)
        hi = lax.ppermute(x[:1], "z", bwd)
        return jnp.concatenate([lo, x, hi], axis=0)

    def zpad(x):
        return jnp.pad(x, ((1, 1), (0, 0), (0, 0)))

    def pins(state):
        """(2, ny, nx) per field: [global plane nz−2, global plane 1],
        broadcast to every shard via ONE batched psum of masked edge-plane
        contributions (2 planes per field over ICI; a single collective
        per stage instead of two per field)."""
        if n_shards == 1:
            return [jnp.concatenate([s[nzl - 2:nzl - 1], s[1:2]], axis=0)
                    for s in state]
        idx = lax.axis_index("z")
        far = jnp.stack([jnp.where(idx == n_shards - 1, s[nzl - 2],
                                   jnp.zeros_like(s[0])) for s in state])
        near = jnp.stack([jnp.where(idx == 0, s[1],
                                    jnp.zeros_like(s[0])) for s in state])
        both = lax.psum(jnp.stack([far, near]), "z")   # (2, |state|, ny, nx)
        return [jnp.stack([both[0, i], both[1, i]])
                for i in range(len(state))]

    def fix_vel_shell(out, src, first, last):
        out = out.at[0].set(jnp.where(first, src[0], out[0]))
        out = out.at[-1].set(jnp.where(last, src[-1], out[-1]))
        return out

    def wrap_z_shell(out, first, last, zspec=("periodic", "periodic")):
        """Global z-shell restore per face: "periodic" (cross-shard wrap),
        "neumann" (adjacent interior plane, local to the edge shard), or a
        float Dirichlet constant — the thermal z-face semantics."""
        lo_spec, hi_spec = zspec
        if lo_spec == "periodic":
            if n_shards == 1:
                src_lo = out[nzl - 2:nzl - 1]
            else:
                src_lo = lax.ppermute(out[nzl - 2:nzl - 1], "z",
                                      [(n_shards - 1, 0)])
        elif lo_spec == "neumann":
            src_lo = out[1:2]
        else:
            src_lo = jnp.full_like(out[0:1], lo_spec)
        if hi_spec == "periodic":
            if n_shards == 1:
                src_hi = out[1:2]
            else:
                src_hi = lax.ppermute(out[1:2], "z", [(0, n_shards - 1)])
        elif hi_spec == "neumann":
            src_hi = out[nzl - 2:nzl - 1]
        else:
            src_hi = jnp.full_like(out[0:1], hi_spec)
        out = out.at[0:1].set(jnp.where(first, src_lo, out[0:1]))
        out = out.at[nzl - 1:nzl].set(jnp.where(last, src_hi,
                                                out[nzl - 1:nzl]))
        return out

    t_zspec = ("periodic", "periodic")
    if params.energy_enabled:
        from ..boundary.types import thermal_z_specs
        t_zspec = thermal_z_specs(params.thermal_bc)

    def local_step(u, v, w, p, rho, T, dtc, su, sv):
        idx = lax.axis_index("z")
        first = idx == 0
        last = idx == n_shards - 1
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)
        # padded plane k is global plane idx·nzl + (k − 1)
        z_off = (idx * nzl - 1).astype(dtype)

        def scal(factor, acc_mix, weight):
            return jnp.stack([factor, acc_mix, weight, su, sv, dtc,
                              z_off])

        q0 = (u, v, w, p)
        q0p = tuple(zpad(q) for q in q0)
        rhop = zpad(rho)
        Tp_ = hpad(T)
        acc = tuple(jnp.zeros_like(zpad(u)) for _ in range(4))

        def run_mid(state, acc, factor, weight):
            outs = mid(scal(factor, zero, weight),
                       *(hpad(s) for s in state), Tp_, *q0p, rhop,
                       *acc, *pins(state))
            # next-state slices return to local (nzl) layout; acc stays
            # padded (its pad planes are zero and never read as data)
            return (tuple(o[1:-1] for o in outs[:4]),
                    tuple(zpad(o[1:-1]) for o in outs[4:8]))

        if order == 2:
            s1, a1 = run_mid(q0, acc, dtc, one)
            outs = fin(scal(0.5 * dtc, one, zero),
                       *(hpad(s) for s in s1), Tp_, *q0p, rhop,
                       *a1, *pins(s1))
        else:
            s1, a1 = run_mid(q0, acc, 0.5 * dtc, one)
            s2, a2 = run_mid(s1, a1, 0.5 * dtc, 2.0 * one)
            s3, a3 = run_mid(s2, a2, dtc, 2.0 * one)
            outs = fin(scal(dtc / 6.0, one, zero),
                       *(hpad(s) for s in s3), Tp_, *q0p, rhop,
                       *a3, *pins(s3))
        un, vn, wn, pn, rn, Tn = (o[1:-1] for o in outs[:6])
        # RK wraps ALL variables periodically (no velocity restore); T's
        # z-faces honor the thermal BC config when the energy eq is on.
        un = wrap_z_shell(un, first, last)
        vn = wrap_z_shell(vn, first, last)
        wn = wrap_z_shell(wn, first, last)
        pn = wrap_z_shell(pn, first, last)
        rn = wrap_z_shell(rn, first, last)
        Tn = wrap_z_shell(Tn, first, last, t_zspec)
        return un, vn, wn, pn, rn, Tn

    spec = P("z", None, None)
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec,) * 6 + (P(), P(), P()),
        out_specs=(spec,) * 6,
        check_vma=False)

    def step(field: FlowField, dt, iter_idx):
        dtc = jnp.asarray(dt, dtype)
        t = jnp.asarray(iter_idx, dtype) * dtc
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, rho, T = smapped(field.u, field.v, field.w, field.p,
                                     field.rho, field.T, dtc, su, sv)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6), jnp.int32(0))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=jnp.zeros((), dtype),
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def _make_fused_sharded_rk_2d_step(grid: Grid, params: NSParams,
                                   mesh: Mesh, order: int, dtype,
                                   interpret: bool):
    """2D fused shard_map RK2/RK4: y-decomposition feeding the marching
    stage kernels (`ops/pallas/rk2d.py` in global-row mode) — the 2D
    sibling of the fused sharded 2D Euler.  Four edge rows per side ride
    ring ``ppermute``s per stage; the periodic-interior y-wrap pin rows
    (global rows ny−2 and 1 of each stage state) ride ONE batched psum
    per stage; the final state's global y-face rows wrap cross-shard for
    ALL variables (RK wraps velocities too), T per the thermal config."""
    ny, nx = grid.ny, grid.nx
    n_shards = _mesh_y_size(mesh)
    nyl = ny // n_shards

    from ..ops.pallas.rk2d import make_rk2d_stage
    kw = dict(alpha=params.alpha, beta=params.beta, T_ref=params.T_ref,
              gravity=params.gravity, thermal_bc=params.thermal_bc,
              stretch=_stretch_tuple(grid, params),
              scheme=params.nonuniform_scheme,
              dtype=dtype, interpret=interpret, global_ny=ny)
    mid = make_rk2d_stage(nyl + 8, nx, grid.dx0, grid.dy0, grid.xmin,
                          grid.ymin, params.mu, params.pressure_coupling,
                          final=False, **kw)
    fin = make_rk2d_stage(nyl + 8, nx, grid.dx0, grid.dy0, grid.xmin,
                          grid.ymin, params.mu, params.pressure_coupling,
                          final=True, **kw)
    if mid is None or fin is None:
        raise ValueError("fused sharded 2D rk: kernel build failed")
    stretch_fn = _stretch_inputs_2d_fn(grid, params, nyl, dtype)

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    def hpad4(x):
        """(nyl, nx) → (nyl+8, nx): four edge rows per side (edge shards
        get zeros — every consumer keys on the global row)."""
        if n_shards == 1:
            return jnp.pad(x, ((4, 4), (0, 0)))
        lo = lax.ppermute(x[-4:], "y", fwd)
        hi = lax.ppermute(x[:4], "y", bwd)
        return jnp.concatenate([lo, x, hi], axis=0)

    def ypad0(x):
        return jnp.pad(x, ((4, 4), (0, 0)))

    def pins(state):
        """(8, nx): rows 0-3 = (u,v,w,p) at global row ny−2, rows 4-7 at
        global row 1, broadcast to every shard via ONE batched psum."""
        if n_shards == 1:
            return jnp.concatenate(
                [jnp.stack([s[nyl - 2] for s in state]),
                 jnp.stack([s[1] for s in state])])
        yi = lax.axis_index("y")
        far = jnp.stack([jnp.where(yi == n_shards - 1, s[nyl - 2],
                                   jnp.zeros_like(s[0])) for s in state])
        near = jnp.stack([jnp.where(yi == 0, s[1],
                                    jnp.zeros_like(s[0])) for s in state])
        return lax.psum(jnp.concatenate([far, near]), "y")

    def wrap_y_rows(out, firsty, lasty, yspec=("periodic", "periodic")):
        """Global y-face rows on (nyl, nx) shards: "periodic" (cross-shard
        wrap), "neumann" (adjacent interior row), or a Dirichlet float."""
        lo_spec, hi_spec = yspec
        if lo_spec == "periodic":
            src_lo = out[nyl - 2:nyl - 1] if n_shards == 1 else \
                lax.ppermute(out[nyl - 2:nyl - 1], "y",
                             [(n_shards - 1, 0)])
        elif lo_spec == "neumann":
            src_lo = out[1:2]
        else:
            src_lo = jnp.full_like(out[0:1], lo_spec)
        if hi_spec == "periodic":
            src_hi = out[1:2] if n_shards == 1 else \
                lax.ppermute(out[1:2], "y", [(0, n_shards - 1)])
        elif hi_spec == "neumann":
            src_hi = out[nyl - 2:nyl - 1]
        else:
            src_hi = jnp.full_like(out[0:1], hi_spec)
        out = out.at[0:1].set(jnp.where(firsty, src_lo, out[0:1]))
        out = out.at[nyl - 1:nyl].set(
            jnp.where(lasty, src_hi, out[nyl - 1:nyl]))
        return out

    t_yspec = ("periodic", "periodic")
    if params.energy_enabled:
        from ..boundary.types import thermal_y_specs
        t_yspec = thermal_y_specs(params.thermal_bc)

    def local_step(u, v, w, p, rho, T, dtc, su, sv):
        yi = lax.axis_index("y")
        firsty = yi == 0
        lasty = yi == n_shards - 1
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)
        y_off = (yi * nyl - 4).astype(dtype)

        def scal(factor, acc_mix, weight):
            return jnp.stack([factor, acc_mix, weight, su, sv, dtc,
                              y_off])

        q0 = (u[0], v[0], w[0], p[0])
        q0p = tuple(ypad0(q) for q in q0)
        rhop = ypad0(rho[0])
        Tp_ = hpad4(T[0])
        acc = tuple(jnp.zeros_like(q0p[0]) for _ in range(4))
        yps, xpin = ((), ())
        if stretch_fn is not None:
            yps, xrows = stretch_fn(yi)
            yps, xpin = tuple(yps), (xrows,)

        def run_mid(state, acc, factor, weight):
            outs = mid(scal(factor, zero, weight),
                       *(hpad4(s) for s in state), Tp_, *q0p, rhop,
                       *acc, *yps, pins(state), *xpin)
            return (tuple(o[4:-4] for o in outs[:4]),
                    tuple(ypad0(o[4:-4]) for o in outs[4:8]))

        if order == 2:
            s1, a1 = run_mid(q0, acc, dtc, one)
            outs = fin(scal(0.5 * dtc, one, zero),
                       *(hpad4(s) for s in s1), Tp_, *q0p, rhop,
                       *a1, *yps, pins(s1), *xpin)
        else:
            s1, a1 = run_mid(q0, acc, 0.5 * dtc, one)
            s2, a2 = run_mid(s1, a1, 0.5 * dtc, 2.0 * one)
            s3, a3 = run_mid(s2, a2, dtc, 2.0 * one)
            outs = fin(scal(dtc / 6.0, one, zero),
                       *(hpad4(s) for s in s3), Tp_, *q0p, rhop,
                       *a3, *yps, pins(s3), *xpin)
        un, vn, wn, pn, rn, Tn = (o[4:-4] for o in outs)
        un = wrap_y_rows(un, firsty, lasty)
        vn = wrap_y_rows(vn, firsty, lasty)
        wn = wrap_y_rows(wn, firsty, lasty)
        pn = wrap_y_rows(pn, firsty, lasty)
        rn = wrap_y_rows(rn, firsty, lasty)
        Tn = wrap_y_rows(Tn, firsty, lasty, t_yspec)
        return (un[None], vn[None], wn[None], pn[None], rn[None],
                Tn[None])

    spec = P(None, "y", None)
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec,) * 6 + (P(), P(), P()),
        out_specs=(spec,) * 6,
        check_vma=False)

    def step(field: FlowField, dt, iter_idx):
        dtc = jnp.asarray(dt, dtype)
        t = jnp.asarray(iter_idx, dtype) * dtc
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, rho, T = smapped(field.u, field.v, field.w, field.p,
                                     field.rho, field.T, dtc, su, sv)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6), jnp.int32(0))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=jnp.zeros((), dtype),
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step


def _make_fused_sharded_rk_zy_step(grid: Grid, params: NSParams,
                                   mesh: Mesh, order: int, dtype,
                                   interpret: bool, pz: int, py: int):
    """Fused RK2/RK4 over a 2D (z, y) device mesh.

    One shard_map stage-kernel pass per Butcher stage on global-row-mode
    kernels (``make_rk_stage(global_nz, global_ny)``).  The y halo is a
    PERIODIC 4-row ring — the wraparound pair hands the edge shards the
    opposite edge's rows, which is exactly what the kernels'
    periodic-interior shift∓3 y substitutions at global rows 1 / ny−2
    resolve against (no extra y-wrap pins needed; the z wrap still rides
    the per-z-column psum pins).  The final state's global boundary dance
    runs post-kernel in x → y → z order: x faces wrap in-kernel, y-face
    rows and z-face planes ride edge-to-edge ppermutes (z last owns the
    corners), with T's faces resolving per the thermal config."""
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    nzl, nyl = nz // pz, ny // py

    from ..ops.pallas.rk_kernels import make_rk_stage
    thermal_kw = dict(alpha=params.alpha, beta=params.beta,
                      T_ref=params.T_ref, gravity=params.gravity,
                      thermal_bc=params.thermal_bc,
                      stretch=_stretch_tuple(grid, params),
                      scheme=params.nonuniform_scheme)
    mid = make_rk_stage(nzl + 2, nyl + 8, nx, grid.dx0, grid.dy0,
                        grid.dz0, grid.xmin, grid.ymin, params.mu,
                        params.pressure_coupling, final=False,
                        global_nz=nz, global_ny=ny, dtype=dtype,
                        interpret=interpret, **thermal_kw)
    fin = make_rk_stage(nzl + 2, nyl + 8, nx, grid.dx0, grid.dy0,
                        grid.dz0, grid.xmin, grid.ymin, params.mu,
                        params.pressure_coupling, final=True,
                        global_nz=nz, global_ny=ny, dtype=dtype,
                        interpret=interpret, **thermal_kw)
    if mid is None or fin is None:
        raise ValueError("fused sharded zy rk: kernel build failed")
    pins_fn = _stretch_pins_zy_fn(grid, params, nyl, dtype)

    ypad, hpad, unpad, wrap_y_rows, wrap_z_shell = \
        _zy_halo_helpers(nzl, nyl, pz, py)

    def zy0pad(x):
        """Zero-pad plane-only inputs to the kernel block shape (their
        halo planes/rows are never read as data for owned outputs)."""
        return jnp.pad(x, ((1, 1), (4, 4), (0, 0)))

    def pins(state):
        """(2, nyl+8, nx) per field: [global plane nz−2, global plane 1]
        of this y-column, via ONE batched psum over the z ring; the pin
        rows are read pointwise, so the y padding is plain zeros."""
        if pz == 1:
            both = [jnp.concatenate([s[nzl - 2:nzl - 1], s[1:2]], axis=0)
                    for s in state]
        else:
            idx = lax.axis_index("z")
            far = jnp.stack([jnp.where(idx == pz - 1, s[nzl - 2],
                                       jnp.zeros_like(s[0]))
                             for s in state])
            near = jnp.stack([jnp.where(idx == 0, s[1],
                                        jnp.zeros_like(s[0]))
                              for s in state])
            ps = lax.psum(jnp.stack([far, near]), "z")
            both = [jnp.stack([ps[0, i], ps[1, i]])
                    for i in range(len(state))]
        return [jnp.pad(b, ((0, 0), (4, 4), (0, 0))) for b in both]

    t_yspec = ("periodic", "periodic")
    t_zspec = ("periodic", "periodic")
    if params.energy_enabled:
        from ..boundary.types import thermal_y_specs, thermal_z_specs
        t_yspec = thermal_y_specs(params.thermal_bc)
        t_zspec = thermal_z_specs(params.thermal_bc)

    def local_step(u, v, w, p, rho, T, dtc, su, sv):
        zi = lax.axis_index("z")
        first = zi == 0
        last = zi == pz - 1
        yi = lax.axis_index("y")
        firsty = yi == 0
        lasty = yi == py - 1
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)
        z_off = (zi * nzl - 1).astype(dtype)
        y_off = (yi * nyl - 4).astype(dtype)

        def scal(factor, acc_mix, weight):
            return jnp.stack([factor, acc_mix, weight, su, sv, dtc,
                              z_off, y_off])

        q0 = (u, v, w, p)
        q0p = tuple(zy0pad(q) for q in q0)
        rhop = zy0pad(rho)
        Tp_ = hpad(ypad(T))
        acc = tuple(jnp.zeros_like(q0p[0]) for _ in range(4))

        coef_loc = () if pins_fn is None else tuple(pins_fn(yi))

        def run_mid(state, acc, factor, weight):
            outs = mid(scal(factor, zero, weight),
                       *(hpad(ypad(s)) for s in state), Tp_, *q0p, rhop,
                       *acc, *pins(state), *coef_loc)
            return (tuple(unpad(o) for o in outs[:4]),
                    tuple(zy0pad(unpad(o)) for o in outs[4:8]))

        if order == 2:
            s1, a1 = run_mid(q0, acc, dtc, one)
            outs = fin(scal(0.5 * dtc, one, zero),
                       *(hpad(ypad(s)) for s in s1), Tp_, *q0p, rhop,
                       *a1, *pins(s1), *coef_loc)
        else:
            s1, a1 = run_mid(q0, acc, 0.5 * dtc, one)
            s2, a2 = run_mid(s1, a1, 0.5 * dtc, 2.0 * one)
            s3, a3 = run_mid(s2, a2, dtc, 2.0 * one)
            outs = fin(scal(dtc / 6.0, one, zero),
                       *(hpad(ypad(s)) for s in s3), Tp_, *q0p, rhop,
                       *a3, *pins(s3), *coef_loc)
        un, vn, wn, pn, rn, Tn = (unpad(o) for o in outs[:6])
        # RK wraps ALL variables: y rows first, then z planes (corner
        # owners); T's faces honor the thermal config.
        un = wrap_y_rows(un, firsty, lasty)
        vn = wrap_y_rows(vn, firsty, lasty)
        wn = wrap_y_rows(wn, firsty, lasty)
        pn = wrap_y_rows(pn, firsty, lasty)
        rn = wrap_y_rows(rn, firsty, lasty)
        Tn = wrap_y_rows(Tn, firsty, lasty, t_yspec)
        un = wrap_z_shell(un, first, last)
        vn = wrap_z_shell(vn, first, last)
        wn = wrap_z_shell(wn, first, last)
        pn = wrap_z_shell(pn, first, last)
        rn = wrap_z_shell(rn, first, last)
        Tn = wrap_z_shell(Tn, first, last, t_zspec)
        return un, vn, wn, pn, rn, Tn

    spec = P("z", "y", None)
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec,) * 6 + (P(), P(), P()),
        out_specs=(spec,) * 6,
        check_vma=False)

    def step(field: FlowField, dt, iter_idx):
        dtc = jnp.asarray(dt, dtype)
        t = jnp.asarray(iter_idx, dtype) * dtc
        decay = jnp.exp(-jnp.asarray(params.source_decay_rate, dtype) * t)
        su = jnp.asarray(params.source_amplitude_u, dtype) * decay
        sv = jnp.asarray(params.source_amplitude_v, dtype) * decay

        u, v, w, p, rho, T = smapped(field.u, field.v, field.w, field.p,
                                     field.rho, field.T, dtc, su, sv)
        new_field = field.replace(u=u, v=v, w=w, p=p, rho=rho, T=T)
        finite, vmax, pmax, tmax = field_status_and_diagnostics(new_field)
        status = jnp.where(~finite, jnp.int32(-6), jnp.int32(0))
        return new_field, StepResult(
            iterations=jnp.int32(1), status=status,
            residual=jnp.zeros((), dtype),
            max_velocity=vmax, max_pressure=pmax, max_temperature=tmax)

    return step
