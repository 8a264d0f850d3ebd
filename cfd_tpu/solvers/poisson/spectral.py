"""Direct spectral Poisson solver: DST-I diagonalization on the MXU.

TPU-native extension beyond the reference's iterative suite
(`cpu/linear_solver.c` offers Jacobi/RB/SOR/CG/BiCGSTAB only): on a uniform
grid the 5/7-point Laplacian restricted to the Dirichlet-0 correction space
(exactly the operator the reference's CG iterates on,
`linear_solver_cg.c:103-123`) is diagonalized by the type-I discrete sine
transform, so the pressure solve is **direct and exact** (to roundoff).

The fixed point CG converges to is, in operator form (A = −D the Dirichlet-0
interior Laplacian, M the boundary-mirror face terms the Neumann pre-step
`linear_solver_cg.c:320` induces):

    x₁ = x₀ + A⁻¹ (D x₀ + M x₀ − rhs) = (−D)⁻¹ (M x₀ − rhs)

— the warm start *cancels analytically*, as it must for a direct method.
``M x₀`` only touches the six interior faces (the mirrored ghost equals the
first interior value, contributing ``x/d²`` there), so the whole solve is:

    b̃   = face_coeff · x|interior − rhs|interior        (one fused pass)
    x̂   = DST(b̃) / λ                                    (3 MXU matmul passes)
    x    = DST⁻¹_ext(x̂)                                  (3 MXU matmul passes)

where DST⁻¹_ext uses *mirror-extended* inverse matrices — rows for the
boundary shell duplicate the adjacent interior rows — so the output arrives
as the full (nz, ny, nx) array with its Neumann shell already in place: no
Laplacian pass, no interior add, no post-solve boundary fix.

The DST-I is dense sine-matrix contractions (``einsum`` → MXU matmuls)
rather than FFTs: at m≈510 each transform is exactly the shape the systolic
array is built for, and avoids the odd-extension padding + complex
arithmetic a radix-FFT DST needs.  Cost at 512³: ~0.8 TFLOP ≈ tens of ms on
one v5e chip, vs ~450 ms for 30 fused-CG iterations that leave a far larger
residual.

Requires a uniform grid (``PoissonProblem`` carries scalar spacings, so any
constructible problem qualifies) and ≥3 points per active axis.  The sine
matrices are built in float64 on the host and cast once; contractions run at
``Precision.HIGHEST`` by default so float32 solves stay near 1e-6 relative
residual.  Eigenvalues are formed inside the trace from 1D vectors — a
materialized mx·my·mz constant would bloat the HLO by the grid size (the
remote-compile transport rejects such programs).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import (PoissonParams, PoissonProblem, PoissonResult,
                   PoissonStatus)


def _sine_matrix(m: int) -> np.ndarray:
    """Unnormalized DST-I matrix S[a, b] = sin(π(a+1)(b+1)/(m+1)).

    S is symmetric and S·S = ((m+1)/2)·I, so the inverse transform is S
    scaled by 2/(m+1).
    """
    a = np.arange(1, m + 1, dtype=np.float64)
    return np.sin(np.pi * np.outer(a, a) / (m + 1))


def _mirror_extended_inverse(m: int, scale: float) -> np.ndarray:
    """(m+2) × m inverse-DST matrix whose first/last rows duplicate the
    adjacent interior rows: the output carries its own Neumann mirror."""
    G = _sine_matrix(m) * scale
    return np.concatenate([G[:1], G, G[-1:]], axis=0)


def _dirichlet_eigenvalues(m: int, inv_d2: float) -> np.ndarray:
    """Eigenvalues of −d²/dx² (3-point, Dirichlet-0) on m interior points."""
    i = np.arange(1, m + 1, dtype=np.float64)
    return 4.0 * inv_d2 * np.sin(np.pi * i / (2.0 * (m + 1))) ** 2


def _face_coeff(m: int, inv_d2: float) -> np.ndarray:
    """Per-index mirror coefficient along one axis: inv_d2 at the two
    interior faces (summed when m == 1), zero elsewhere."""
    c = np.zeros(m)
    c[0] += inv_d2
    c[-1] += inv_d2
    return c


def spectral_supported(problem: PoissonProblem) -> bool:
    """2D (nz==1) or genuine 3D (nz≥3 with dz>0)."""
    return problem.nz == 1 or (problem.nz >= 3 and problem.dz > 0.0)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def tdma_z_supported(problem: PoissonProblem) -> bool:
    """Whether the TDMA z-stage variant applies (3D, kernel-shaped)."""
    from ...ops.pallas.tdma import tdma_supported
    if not (problem.nz >= 3 and problem.dz > 0.0):
        return False
    return tdma_supported(problem.nz, _ceil_to(problem.ny - 2, 8),
                          _ceil_to(problem.nx - 2, 128))


def tdma_y_supported(problem: PoissonProblem) -> bool:
    """Whether the 2D TDMA y-stage variant applies (nz==1, kernel-shaped).

    The spectral-x axis pads to a multiple of 1024 (the kernel views rows
    as (8, Mx/8) planes, so Mx/8 must stay lane-aligned); the padding is
    zero transform rows/columns, exactly as in the 3D variant.
    """
    from ...ops.pallas.tdma import tdma2d_supported
    if problem.is_3d or problem.ny < 3 or problem.nx < 3:
        return False
    return tdma2d_supported(problem.ny, _ceil_to(problem.nx - 2, 1024))


def _tdma2d_rescue_width(mx: int, lx: np.ndarray, w: float) -> int:
    """Number of low x-modes whose y-line solve is too ill-conditioned for
    a plain f32 Thomas recurrence (see ``_make_btilde_pipeline_tdma2d``).

    Per-mode recurrence condition ≈ 4·inv_dy2/λx[m]; measured on-chip
    (artifacts/tdma2d_timing_probe.py + tpuval) f32 TDMA error tracks it:
    cond<80 → ~3e-8, cond<506 → 2.6e-7, unbounded → 1.3e-3 at 1026².
    Threshold cond ≤ 256 keeps the hybrid at eigen-class (~1e-6) accuracy;
    round up to a lane tile for the thin rescue matmuls.
    """
    k = int(np.searchsorted(lx, 4.0 * w / 256.0))
    return min(_ceil_to(max(k, 1), 128), mx)


def _make_btilde_pipeline_tdma2d(problem: PoissonProblem, precision,
                                 use_kernel: bool = True,
                                 interpret: bool = False):
    """TDMA-y variant of the 2D transform: DSTx → Thomas y-line solve →
    DSTx⁻¹ (`ops/pallas/tdma.py`), with a dense eigen rescue of the lowest
    x-modes.

    After the x transform the 2D pressure system decouples into per-mode
    tridiagonals along y; solving them directly replaces the two y-axis
    HIGHEST matmuls plus the eigenvalue divide — half of the 2D
    transform's MXU work — with one VMEM-resident Thomas kernel.

    Unlike the 3D z-stage (where µ = λx+λy keeps every mode's recurrence
    well-conditioned), the 2D y-lines see µ = λx alone: the smoothest
    modes have condition ~4·inv_dy2/λx[0] ~ (2/π²)·mx², and a plain f32
    Thomas sweep loses ~3 digits there (measured 1.3e-3 max-rel at 1026²
    vs eigen's 1.7e-6; iterative refinement cannot fix it — the f32
    residual itself cancels catastrophically at w·x ~ 1e6·x).  Since each
    mode's line solve is independent, the K ill-conditioned columns
    (cond > 256, K ≈ mx/25 rounded to a lane tile) are re-solved densely
    via the y-DST pair on that thin slice — two (my,ny)×(ny,K) matmuls,
    ~2% of the transform's FLOPs — restoring eigen-class accuracy at
    TDMA speed.  Measured on-chip: see artifacts/tdma2d_timing_probe.py.
    """
    mx, my = problem.nx - 2, problem.ny - 2
    Mx = _ceil_to(mx, 1024)
    nx, ny = problem.nx, problem.ny

    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    lxp = np.pad(lx, (0, Mx - mx), mode="edge")
    w = float(problem.inv_dy2)
    scale = 2.0 / (mx + 1)                 # only the x pair normalizes
    K = _tdma2d_rescue_width(mx, lx, w)

    from ...ops.pallas.tdma import make_tdma_y_2d, tdma_z_reference

    zfn = None
    if use_kernel:
        zfn = make_tdma_y_2d(ny, Mx, lxp, w, jnp.float32,
                             interpret=interpret)

    built = {}

    def build(dt):
        np_dt = np.dtype(dt)
        Fxp = np.zeros((Mx, nx), np_dt)
        Fxp[:mx, 1:nx - 1] = _sine_matrix(mx)
        Gxp = np.zeros((nx, Mx), np_dt)
        Gxp[:, :mx] = _mirror_extended_inverse(mx, scale)
        # y-eigen rescue factors for the K lowest x-modes
        Fyp = np.zeros((my, ny), np_dt)
        Fyp[:, 1:ny - 1] = _sine_matrix(my)
        Gyp = np.asarray(_mirror_extended_inverse(my, 2.0 / (my + 1)),
                         np_dt)
        return Fxp, Gxp, Fyp, Gyp

    def pipeline(btilde):
        dt = btilde.dtype
        if dt not in built:
            built[dt] = build(dt)
        Fxp, Gxp, Fyp, Gyp = built[dt]
        prec = precision
        b = btilde[0]                                      # (ny, nx)
        a = jnp.matmul(b, Fxp.T, precision=prec)           # (ny, Mx)
        if zfn is not None and dt == jnp.float32:
            x = zfn(a)
        else:
            x = tdma_z_reference(a[:, None, :],
                                 jnp.asarray(lxp, dt)[None, :], w)[:, 0, :]
        if dt == jnp.float32:
            # dense rescue of the ill-conditioned low-mode columns.  When
            # a forced z_mode="tdma" hits K == mx (all columns
            # ill-conditioned — auto picks eigen there) this degenerates
            # to the full dense y-solve, keeping accuracy over speed.
            s = jnp.matmul(Fyp, a[:, :K], precision=prec)  # (my, K)
            lam = (jnp.asarray(ly, dt)[:, None]
                   + jnp.asarray(lx[:K], dt)[None, :])
            s = jnp.matmul(Gyp, s / lam, precision=prec)   # (ny, K)
            x = lax.dynamic_update_slice(x, s, (0, 0))
        a = jnp.matmul(x, Gxp.T, precision=prec)           # (ny, nx)
        return a[None]

    return pipeline


def dst2d_fused_supported(problem: PoissonProblem) -> bool:
    """Whether the in-kernel DST-fused 2D projection pieces apply: 2D,
    TDMA-y kernel shape, mode dims equal to grid dims on x (true exactly
    when nx % 1024 == 0 — then ceil(nx−2, 1024) == nx, so the
    x-transformed blocks keep the (B, nx) shape the marching kernels
    stream), and the dense low-mode rescue not degenerating to every
    column (strongly anisotropic dy ≪ dx grids keep the eigen path)."""
    if problem.is_3d or problem.ny < 3 or problem.nx < 3:
        return False
    mx = problem.nx - 2
    if _ceil_to(mx, 1024) != problem.nx:
        return False
    if not tdma_y_supported(problem):
        return False
    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    return _tdma2d_rescue_width(mx, lx, float(problem.inv_dy2)) < mx


def make_dst2d_fused_pieces(problem: PoissonProblem, dtype=jnp.float32,
                            use_kernel: bool = True,
                            interpret: bool = False,
                            precision=lax.Precision.HIGHEST):
    """Pieces for the DST-fused 2D projection step
    (`ops/pallas/projection2d.Projection2DKernels(dst_mats=...)`): the
    predictor marching kernel applies the forward x-DST per b̃ block
    in-kernel (one MXU dot riding the block streaming), the corrector
    applies the mirror-extended inverse per pressure block on DMA
    arrival, and only the y line solve runs between the two sweeps — the
    2D twin of :func:`make_dst_fused_pieces`, with the TDMA-y +
    dense-low-mode-rescue stage (r4) as the line solve.

    Returns ``(FxT, GxT, ysolve)``: host numpy factors such that
    forward = block·FxT and inverse = block·GxT (scale folded into Gx;
    numerically identical to `_make_btilde_pipeline_tdma2d`'s matmuls),
    and ``ysolve(bt_x) → x̂`` on (1, ny, nx) transform-space arrays
    (zero y-shell rows in, mirror-extended y-shell rows out).
    """
    if not dst2d_fused_supported(problem):
        raise ValueError("dst2d-fused pieces unsupported for this problem")
    mx, my = problem.nx - 2, problem.ny - 2
    Mx = _ceil_to(mx, 1024)
    nx, ny = problem.nx, problem.ny
    np_dt = np.dtype(dtype)

    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    lxp = np.pad(lx, (0, Mx - mx), mode="edge")
    w = float(problem.inv_dy2)
    scale = 2.0 / (mx + 1)                 # only the x pair normalizes
    K = _tdma2d_rescue_width(mx, lx, w)

    Fxp = np.zeros((Mx, nx), np_dt)
    Fxp[:mx, 1:nx - 1] = _sine_matrix(mx)
    Gxp = np.zeros((nx, Mx), np_dt)
    Gxp[:, :mx] = _mirror_extended_inverse(mx, scale)
    FxT = np.ascontiguousarray(Fxp.T)      # (nx, Mx), Mx == nx
    GxT = np.ascontiguousarray(Gxp.T)      # (Mx, nx)
    # dense y-eigen rescue factors for the K lowest x-modes
    Fyp = np.zeros((my, ny), np_dt)
    Fyp[:, 1:ny - 1] = _sine_matrix(my)
    Gyp = np.asarray(_mirror_extended_inverse(my, 2.0 / (my + 1)), np_dt)

    from ...ops.pallas.tdma import make_tdma_y_2d, tdma_z_reference

    zfn = None
    if use_kernel and dtype == jnp.float32:
        zfn = make_tdma_y_2d(ny, Mx, lxp, w, jnp.float32,
                             interpret=interpret)

    def ysolve(bt_x):
        a = bt_x[0]                                        # (ny, Mx)
        dt = a.dtype
        if zfn is not None and dt == jnp.float32:
            x = zfn(a)
        else:
            x = tdma_z_reference(a[:, None, :],
                                 jnp.asarray(lxp, dt)[None, :], w)[:, 0, :]
        # dense rescue of the ill-conditioned low-mode columns (same
        # numerics as _make_btilde_pipeline_tdma2d — the f32 Thomas
        # recurrence loses ~3 digits where cond = 4w/λx > 256)
        s = jnp.matmul(jnp.asarray(Fyp, dt), a[:, :K], precision=precision)
        lam = (jnp.asarray(ly, dt)[:, None]
               + jnp.asarray(lx[:K], dt)[None, :])
        s = jnp.matmul(jnp.asarray(Gyp, dt), s / lam, precision=precision)
        x = lax.dynamic_update_slice(x, s, (0, 0))
        return x[None]

    return FxT, GxT, ysolve


def dst2d_fused_sharded_supported(problem: PoissonProblem,
                                  n_shards: int) -> bool:
    """Whether the y-sharded DST-fused 2D projection applies: the
    single-chip dst2d shapes (x mode dim == nx, i.e. nx % 1024 == 0),
    ny divisible by the shard count into marching-size row blocks
    (>= 24 rows/shard, multiple of 8), and nx divisible into
    MXU-aligned mode slabs (nx/P % 128) for the x-mode-pencil
    ``all_to_all``s around the per-slab y solve."""
    P = int(n_shards)
    if not dst2d_fused_supported(problem):
        return False
    if problem.ny % P or (problem.ny // P) % 8 or problem.ny // P < 24:
        return False
    return problem.nx % P == 0 and (problem.nx // P) % 128 == 0


def make_dst2d_fused_sharded_pieces(problem: PoissonProblem,
                                    n_shards: int, axis_name: str = "y",
                                    dtype=jnp.float32,
                                    use_kernel: bool = True,
                                    interpret: bool = False,
                                    precision=lax.Precision.HIGHEST):
    """y-sharded twin of :func:`make_dst2d_fused_pieces` for use *inside*
    ``shard_map``: the x DSTs stay in the per-shard marching kernels
    (row-local under y decomposition), and the returned
    ``ysolve_local(bt_local) → x̂_local`` runs the only cross-shard stage
    — the y line solve — as two x-mode-pencil ``all_to_all``s around a
    dense y-eigenbasis solve on (ny, nx/P) slabs.

    Unlike the single-chip y-stage (whole-array VMEM TDMA + dense
    low-mode rescue — whose kernel needs mode width % 1024, which the
    1/P slabs break), the slab stage is the plain eigen contraction:
    at 1/P width the two (my × ny) matmuls cost 1/P of the full-grid
    y-DST pair — cheap next to the in-kernel x transforms — and carry
    eigen-class accuracy with no conditioning caveats.  ``P == 1``
    returns the single-chip pieces unchanged (TDMA-y + rescue).

    ``bt_local``: the shard's (1, ny/P, nx) x-transformed b̃ rows with
    zero global y-shell rows; ``x̂_local`` comes back in the same layout
    with the mirror-extended global y-shells in place (the corrector
    marching kernel inverse-transforms per block on DMA arrival).
    """
    P = int(n_shards)
    if not dst2d_fused_sharded_supported(problem, P):
        raise ValueError("dst2d-fused sharded pieces unsupported for "
                         "this (problem, n_shards)")
    if P == 1:
        return make_dst2d_fused_pieces(problem, dtype,
                                       use_kernel=use_kernel,
                                       interpret=interpret,
                                       precision=precision)
    mx, my = problem.nx - 2, problem.ny - 2
    nx, ny = problem.nx, problem.ny
    Mx = nx                                # dst2d gate: mode dim == nx
    np_dt = np.dtype(dtype)
    nxl = nx // P

    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    lxp = np.pad(lx, (0, Mx - mx), mode="edge")
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    scale = 2.0 / (mx + 1)                 # only the x pair normalizes

    Fxp = np.zeros((Mx, nx), np_dt)
    Fxp[:mx, 1:nx - 1] = _sine_matrix(mx)
    Gxp = np.zeros((nx, Mx), np_dt)
    Gxp[:, :mx] = _mirror_extended_inverse(mx, scale)
    FxT = np.ascontiguousarray(Fxp.T)
    GxT = np.ascontiguousarray(Gxp.T)
    Fyp = np.zeros((my, ny), np_dt)
    Fyp[:, 1:ny - 1] = _sine_matrix(my)
    Gyp = np.asarray(_mirror_extended_inverse(my, 2.0 / (my + 1)), np_dt)

    def ysolve_local(bt_local):
        idx = lax.axis_index(axis_name)
        a = lax.all_to_all(bt_local, axis_name, split_axis=2,
                           concat_axis=1, tiled=True)[0]   # (ny, nx/P)
        dt = a.dtype
        s = jnp.matmul(jnp.asarray(Fyp, dt), a, precision=precision)
        lx_loc = lax.dynamic_slice(jnp.asarray(lxp, dt),
                                   ((idx * nxl).astype(jnp.int32),),
                                   (nxl,))
        lam = jnp.asarray(ly, dt)[:, None] + lx_loc[None, :]
        x = jnp.matmul(jnp.asarray(Gyp, dt), s / lam, precision=precision)
        return lax.all_to_all(x[None], axis_name, split_axis=1,
                              concat_axis=2, tiled=True)

    return FxT, GxT, ysolve_local


def dst_fused_supported(problem: PoissonProblem) -> bool:
    """Whether the in-kernel DST-fused projection pieces apply: 3D,
    TDMA-z kernel shape, and mode dims equal to grid dims (true exactly
    when nx % 128 == 0 and ny % 8 == 0, the rolling engine's own gates —
    then ceil(nx−2, 128) == nx and ceil(ny−2, 8) == ny, so the
    xy-transformed planes keep the (ny, nx) plane shape the marching
    kernels stream)."""
    if not (problem.nz >= 3 and problem.dz > 0.0):
        return False
    if (_ceil_to(problem.nx - 2, 128) != problem.nx
            or _ceil_to(problem.ny - 2, 8) != problem.ny):
        return False
    return tdma_z_supported(problem)


def _dst_fused_mats(problem: PoissonProblem, np_dt):
    """Shared factor builder for the DST-fused projection kernels:
    ``(mats, mu, w)`` with ``mats = (FxT, Fy, GxT, Gy)`` host numpy sine
    matrices (forward = Fy·(plane·FxT), inverse = Gy·(plane·GxT), scale
    folded into Gx), ``mu`` the (My, Mx) per-mode eigenvalue-sum plane
    for the z line solve, ``w = 1/dz²``."""
    mx, my = problem.nx - 2, problem.ny - 2
    Mx, My = _ceil_to(mx, 128), _ceil_to(my, 8)
    nx, ny = problem.nx, problem.ny
    if (Mx, My) != (nx, ny):
        raise ValueError("dst-fused pieces need mode dims == grid dims")

    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    w = float(problem.inv_dz2)
    scale = (2.0 / (mx + 1)) * (2.0 / (my + 1))
    mu_np = (np.pad(ly, (0, My - my), mode="edge")[:, None]
             + np.pad(lx, (0, Mx - mx), mode="edge")[None, :])

    Fxp = np.zeros((Mx, nx), np_dt)
    Fxp[:mx, 1:nx - 1] = _sine_matrix(mx)
    Fyp = np.zeros((My, ny), np_dt)
    Fyp[:my, 1:ny - 1] = _sine_matrix(my)
    Gxp = np.zeros((nx, Mx), np_dt)
    Gxp[:, :mx] = _mirror_extended_inverse(mx, scale)
    Gyp = np.zeros((ny, My), np_dt)
    Gyp[:, :my] = _mirror_extended_inverse(my, 1.0)
    mats = (np.ascontiguousarray(Fxp.T), Fyp,
            np.ascontiguousarray(Gxp.T), Gyp)
    return mats, mu_np, w


def make_dst_fused_pieces(problem: PoissonProblem, dtype=jnp.float32,
                          use_kernel: bool = True, interpret: bool = False,
                          fuse_fwd: bool = False):
    """Pieces for the DST-fused projection step (`ops/pallas/
    projection_kernels.ProjectionKernels(dst_mats=...)`): the predictor
    mega kernel applies the forward x/y DST per b̃ plane in-kernel, the
    corrector applies the mirror-extended inverse per x̂ plane on window
    arrival, and only the z line solve runs between the two sweeps.

    Returns ``(mats, zsolve)``:

    * ``mats = (FxT, Fy, GxT, Gy)`` — host numpy matrices (trace-safe)
      such that forward = Fy·(plane·FxT) and inverse = Gy·(plane·GxT),
      numerically identical factors to `_make_btilde_pipeline_tdma`'s
      einsums (scale folded into Gx);
    * ``zsolve(bxy) → x̂`` — the TDMA z-stage on (nz, ny, nx)
      transform-space arrays, mirror-extended z-shells on output.

    With ``fuse_fwd=True`` the Thomas FORWARD sweep moves into the
    predictor kernel too (`ProjectionKernels(tdma_fwd=...)`), and the
    return becomes ``(mats, (mu_plane, w), zbwd)`` with
    ``zbwd(d, t) → x̂`` the backward substitution only
    (`tdma.make_tdma_z_bwd`) — the standalone forward kernel's 3 HBM
    passes disappear from the step.
    """
    mats, mu_np, w = _dst_fused_mats(problem, np.dtype(dtype))
    nx, ny, nz = problem.nx, problem.ny, problem.nz
    np_dt = np.dtype(dtype)
    My, Mx = mu_np.shape

    from ...ops.pallas.tdma import (make_tdma_z, make_tdma_z_bwd,
                                    tdma_z_bwd_reference, tdma_z_reference)

    if fuse_fwd:
        zbwd = None
        if use_kernel and dtype == jnp.float32:
            zbwd = make_tdma_z_bwd(nz, My, Mx, mu_np, w, jnp.float32,
                                   interpret=interpret)
        if zbwd is None:
            zbwd = tdma_z_bwd_reference
        return mats, (mu_np.astype(np_dt), w), zbwd

    zfn = None
    if use_kernel and dtype == jnp.float32:
        zfn = make_tdma_z(nz, My, Mx, mu_np, w, jnp.float32,
                          interpret=interpret)
    if zfn is None:
        # numpy held, converted per trace (trace safety, docs/design.md)
        def zfn(a, _mu=mu_np.astype(np_dt)):
            return tdma_z_reference(a, jnp.asarray(_mu), w)

    return mats, zfn


def dst_fused_sharded_supported(problem: PoissonProblem,
                                n_shards: int) -> bool:
    """Whether the z-sharded DST-fused projection applies: single-chip
    DST-fused shape, both nz and ny divisible by the shard count (the
    y-pencil transposes), and the y-slab TDMA kernel shape holding for
    the (nz, ny/P, nx) pencils."""
    from ...ops.pallas.tdma import tdma_supported
    P = int(n_shards)
    if not dst_fused_supported(problem):
        return False
    if problem.nz % P != 0 or problem.ny % P != 0:
        return False
    return tdma_supported(problem.nz, problem.ny // P, problem.nx)


def make_dst_fused_sharded_pieces(problem: PoissonProblem, n_shards: int,
                                  axis_name: str = "z",
                                  dtype=jnp.float32,
                                  use_kernel: bool = True,
                                  interpret: bool = False):
    """z-sharded twin of :func:`make_dst_fused_pieces` for use *inside*
    ``shard_map``: the xy DSTs stay in the per-shard mega kernels
    (plane-local under z decomposition), and the returned
    ``zsolve_local(bt_local) → x̂_local`` runs the only cross-shard stage
    — the z line solve — as two y-pencil ``all_to_all``s around a local
    Thomas sweep on (nz, ny/P, nx) y-slabs.  Each shard's slab sees its
    own slice of the (ny, nx) eigenvalue plane, passed to the TDMA kernel
    at call time (``tdma.make_tdma_z(mu=None)``).

    ``bt_local``: the shard's (nz/P, ny, nx) xy-transformed b̃ planes with
    zero global z-shell planes; ``x̂_local`` comes back in the same layout
    with the mirror-extended global z-shells in place (the corrector mega
    kernel inverse-transforms per plane on window arrival).
    """
    P = int(n_shards)
    if not dst_fused_sharded_supported(problem, P):
        raise ValueError("dst-fused sharded pieces unsupported for this "
                         "(problem, n_shards)")
    np_dt = np.dtype(dtype)
    mats, mu_np, w = _dst_fused_mats(problem, np_dt)
    zsolve_local = _make_sharded_zsolve(
        mu_np.astype(np_dt), w, problem.nz, problem.ny, problem.nx, P,
        axis_name, dtype, use_kernel, interpret)
    return mats, zsolve_local


def dst_fused_sharded_zy_supported(problem: PoissonProblem,
                                   n_z: int, n_y: int) -> bool:
    """Whether the (z, y)-mesh DST-fused projection applies: 3D with mode
    dims equal to grid dims (nx % 128 == 0, ny % 8 == 0 — the in-kernel
    x transforms then keep the plane shape), nz/ny divisible by the mesh
    axes, local rows a multiple of 8 (the 4-row halo pad keeps the
    sublane alignment), and nx divisible by Pz (the x-mode ``all_to_all``
    split of the cross-shard y/z solve)."""
    Pz, Py = int(n_z), int(n_y)
    if not (problem.is_3d and problem.nz >= 3 and problem.dz > 0.0):
        return False
    if (_ceil_to(problem.nx - 2, 128) != problem.nx
            or _ceil_to(problem.ny - 2, 8) != problem.ny):
        return False
    if problem.nz % Pz != 0 or problem.ny % Py != 0:
        return False
    if (problem.ny // Py) % 8 != 0:
        return False
    return problem.nx % Pz == 0


def make_dst_fused_sharded_zy_pieces(problem: PoissonProblem,
                                     n_z: int, n_y: int,
                                     axis_z: str = "z", axis_y: str = "y",
                                     dtype=jnp.float32,
                                     precision=lax.Precision.HIGHEST):
    """(z, y)-mesh twin of :func:`make_dst_fused_sharded_pieces` for use
    *inside* ``shard_map`` on a 2D device mesh.

    Under y decomposition only the **x** DST is row-local, so only the x
    transforms ride the mega kernels; returns ``(mats_x, yzsolve_local)``:

    * ``mats_x = (FxT, GxT)`` — host numpy matrices for the in-kernel
      forward/inverse x transforms (the full xy normalization folds into
      ``GxT``, numerically the same factors as
      :func:`make_dst_fused_pieces`'s);
    * ``yzsolve_local(bt_local) → x̂_local`` — the cross-shard stage on
      (nz/Pz, ny/Py, nx) **x-transform-space** blocks: four
      ``all_to_all``s re-pencil between a dense z-spectral stage and the
      y-spectral solve (DSTy, ÷λ, DSTy⁻¹), mirroring
      :func:`make_btilde_pipeline_sharded_zy` minus its x stages.  The
      output keeps x-transform space (the corrector mega kernel
      inverse-x-DSTs each plane on window arrival) and carries the global
      z and y mirror shells on the edge shards' owned rows/planes.

    The spectral-z axis zero-pads to a multiple of ``Py`` exactly as in
    the full zy pencil pipeline; the x-mode axis is already nx wide (two
    zero pad columns from the kernel-side ``Fx``) and splits over ``Pz``
    (gated by :func:`dst_fused_sharded_zy_supported`).
    """
    Pz, Py = int(n_z), int(n_y)
    if not dst_fused_sharded_zy_supported(problem, Pz, Py):
        raise ValueError("dst-fused zy pieces unsupported for this "
                         "(problem, Pz, Py)")
    np_dt = np.dtype(dtype)
    mats, _mu, _w = _dst_fused_mats(problem, np_dt)
    mats_x = (mats[0], mats[2])   # (FxT, GxT); xy scale folded into GxT

    nx, ny, nz = problem.nx, problem.ny, problem.nz
    mx, my, mz = nx - 2, ny - 2, nz - 2
    mzp = ((mz + Py - 1) // Py) * Py
    cx = nx // Pz
    cz = mzp // Py

    # padded eigenvalues are 1 so 0/1 stays 0 on the zero pad modes
    lx = np.ones(nx)
    lx[:mx] = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    lz = np.ones(mzp)
    lz[:mz] = _dirichlet_eigenvalues(mz, problem.inv_dz2)

    def pad_cols(S):
        return np.pad(S, ((0, 0), (1, 1)))

    # host numpy on purpose (trace safety, docs/design.md); converted per
    # call.  The z normalization 2/(mz+1) folds into Gz (x/y's live in
    # the kernel-side GxT).
    Fy_h = pad_cols(_sine_matrix(my)).astype(np_dt)            # (my, ny)
    Gy_h = _mirror_extended_inverse(my, 1.0).astype(np_dt)     # (ny, my)
    Fz_h = np.pad(pad_cols(_sine_matrix(mz)),
                  ((0, mzp - mz), (0, 0))).astype(np_dt)       # (mzp, nz)
    Gz_h = np.pad(_mirror_extended_inverse(mz, 2.0 / (mz + 1)),
                  ((0, 0), (0, mzp - mz))).astype(np_dt)       # (nz, mzp)
    vx_h = lx.astype(np_dt)
    vy_h = ly.astype(np_dt)
    vz_h = lz.astype(np_dt)

    def a2a(a, name, split, concat):
        n = Pz if name == axis_z else Py
        if n == 1:
            return a
        return lax.all_to_all(a, name, split_axis=split,
                              concat_axis=concat, tiled=True)

    def yzsolve_local(bt_local):
        prec = precision
        dt = bt_local.dtype
        zi = lax.axis_index(axis_z)
        yi = lax.axis_index(axis_y)
        a = a2a(bt_local, axis_z, 2, 0)              # (nz, nyl, cx)
        a = jnp.einsum("cz,zyx->cyx", jnp.asarray(Fz_h, dt), a,
                       precision=prec)               # (mzp, nyl, cx)
        a = a2a(a, axis_y, 0, 1)                     # (cz, ny, cx)
        a = jnp.einsum("by,zyx->zbx", jnp.asarray(Fy_h, dt), a,
                       precision=prec)               # (cz, my, cx)
        vz_loc = lax.dynamic_slice(jnp.asarray(vz_h, dt),
                                   ((yi * cz).astype(jnp.int32),), (cz,))
        vx_loc = lax.dynamic_slice(jnp.asarray(vx_h, dt),
                                   ((zi * cx).astype(jnp.int32),), (cx,))
        lam = (vz_loc[:, None, None]
               + jnp.asarray(vy_h, dt)[None, :, None]
               + vx_loc[None, None, :])
        a = a / lam
        a = jnp.einsum("by,zyx->zbx", jnp.asarray(Gy_h, dt), a,
                       precision=prec)               # (cz, ny, cx)
        a = a2a(a, axis_y, 1, 0)                     # (mzp, nyl, cx)
        a = jnp.einsum("cz,zyx->cyx", jnp.asarray(Gz_h, dt), a,
                       precision=prec)               # (nz, nyl, cx)
        return a2a(a, axis_z, 0, 2)                  # (nzl, nyl, nx)

    return mats_x, yzsolve_local


def _make_sharded_zsolve(mu_host, w, nz, ny, nx, P, axis_name,
                         dtype=jnp.float32, use_kernel: bool = True,
                         interpret: bool = False):
    """Shared z-line-solve stage of the sharded transform-fused
    projections: two y-pencil ``all_to_all``s around a runtime-μ TDMA on
    (nz, ny/P, nx) slabs.  ``mu_host`` is the full (ny, nx) per-mode
    eigenvalue plane held as host numpy (trace safety); each shard
    dynamic-slices its own y rows at call time.  Used by both the uniform
    DST pieces and the generalized-eigenbasis (consistent-scheme) twin —
    the solve never cares which basis produced the modes."""
    from ...ops.pallas.tdma import make_tdma_z, tdma_z_reference

    nyl = ny // P
    zfn = None
    if use_kernel and dtype == jnp.float32:
        zfn = make_tdma_z(nz, nyl, nx, None, w, jnp.float32,
                          interpret=interpret)

    def zsolve_local(bt_local):
        idx = lax.axis_index(axis_name)
        a = (bt_local if P == 1
             else lax.all_to_all(bt_local, axis_name, split_axis=1,
                                 concat_axis=0, tiled=True))
        i0 = (idx * nyl).astype(jnp.int32)
        mu_loc = lax.dynamic_slice(jnp.asarray(mu_host),
                                   (i0, jnp.int32(0)), (nyl, nx))
        if zfn is not None:
            x = zfn(a, mu_loc)
        else:
            x = tdma_z_reference(a, mu_loc.astype(a.dtype), w)
        return (x if P == 1
                else lax.all_to_all(x, axis_name, split_axis=0,
                                    concat_axis=1, tiled=True))

    return zsolve_local


def _make_btilde_pipeline_tdma(problem: PoissonProblem, precision,
                               use_kernel: bool = True,
                               interpret: bool = False):
    """TDMA-z variant of the transform: DSTx/DSTy → Thomas z-line solve →
    DSTy⁻¹/DSTx⁻¹ (`ops/pallas/tdma.py`).

    Mathematically identical to the eigen pipeline (both solve the same
    per-mode tridiagonal exactly; differences are f32 rounding, ≤ ~2e−7
    relative) but replaces the two z-axis HIGHEST matmuls plus the
    eigenvalue divide — the most expensive third of the 3D transform —
    with two bandwidth-bound marching sweeps.  Mode dimensions are padded
    to (8, 128)-aligned (Mx, My) with zero transform rows/columns so the
    marching kernel's lane constraints hold; padded columns carry zero
    rhs and solve to zero.
    """
    mx, my, mz = problem.nx - 2, problem.ny - 2, problem.nz - 2
    Mx, My = _ceil_to(mx, 128), _ceil_to(my, 8)
    nx, ny, nz = problem.nx, problem.ny, problem.nz

    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    w = float(problem.inv_dz2)
    scale = (2.0 / (mx + 1)) * (2.0 / (my + 1))
    mu_np = (np.pad(ly, (0, My - my), mode="edge")[:, None]
             + np.pad(lx, (0, Mx - mx), mode="edge")[None, :])

    from ...ops.pallas.tdma import make_tdma_z, tdma_z_reference

    zfn = None
    if use_kernel:
        zfn = make_tdma_z(nz, My, Mx, mu_np, w, jnp.float32,
                          interpret=interpret)

    built = {}

    def build(dt):
        np_dt = np.dtype(dt)
        Fxp = np.zeros((Mx, nx), np_dt)
        Fxp[:mx, 1:nx - 1] = _sine_matrix(mx)
        Fyp = np.zeros((My, ny), np_dt)
        Fyp[:my, 1:ny - 1] = _sine_matrix(my)
        Gxp = np.zeros((nx, Mx), np_dt)
        Gxp[:, :mx] = _mirror_extended_inverse(mx, scale)
        Gyp = np.zeros((ny, My), np_dt)
        Gyp[:, :my] = _mirror_extended_inverse(my, 1.0)
        return Fxp, Fyp, Gxp, Gyp

    def pipeline(btilde):
        dt = btilde.dtype
        if dt not in built:
            built[dt] = build(dt)
        Fxp, Fyp, Gxp, Gyp = built[dt]
        prec = precision
        a = jnp.einsum("ax,zyx->zya", Fxp, btilde, precision=prec)
        a = jnp.einsum("by,zyx->zbx", Fyp, a, precision=prec)
        if zfn is not None and dt == jnp.float32:
            x = zfn(a)
        else:
            x = tdma_z_reference(a, jnp.asarray(mu_np, dt), w)
        a = jnp.einsum("ax,zyx->zya", Gxp, x, precision=prec)
        a = jnp.einsum("by,zyx->zbx", Gyp, a, precision=prec)
        return a

    return pipeline


def _make_btilde_pipeline(problem: PoissonProblem, precision):
    """The core transform: full-shape zero-shell b̃ → full-shape x_new.

    Forward matrices are (m, n) — interior sine columns with zero boundary
    columns, so the input needs no interior slicing; inverse matrices are
    the (n, m) mirror-extended factors (the output carries its Neumann
    shell).  Matrices are built per dtype on first use.
    """
    is_3d = problem.is_3d
    mx, my = problem.nx - 2, problem.ny - 2
    mz = problem.nz - 2 if is_3d else 1

    lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    lz = (_dirichlet_eigenvalues(mz, problem.inv_dz2) if is_3d
          else np.zeros(1))
    scale = (2.0 / (mx + 1)) * (2.0 / (my + 1))
    if is_3d:
        scale *= 2.0 / (mz + 1)

    def pad_cols(S):
        return np.pad(S, ((0, 0), (1, 1)))

    built = {}

    def build(dt):
        # numpy on purpose (trace-safety): these are memoized in `built`
        # across calls — a jnp constant created during one trace would be
        # a tracer and leak into later traces.  The consuming einsums
        # convert per trace.
        np_dt = np.dtype(dt)  # ml_dtypes covers bfloat16
        Fx = np.asarray(pad_cols(_sine_matrix(mx)), np_dt)
        Fy = np.asarray(pad_cols(_sine_matrix(my)), np_dt)
        Fz = np.asarray(pad_cols(_sine_matrix(mz)), np_dt) if is_3d else None
        # The 1/(m+1) normalizations all fold into Gx.
        Gx = np.asarray(_mirror_extended_inverse(mx, scale), np_dt)
        Gy = np.asarray(_mirror_extended_inverse(my, 1.0), np_dt)
        Gz = (np.asarray(_mirror_extended_inverse(mz, 1.0), np_dt)
              if is_3d else None)
        vx, vy, vz = (np.asarray(v, np_dt) for v in (lx, ly, lz))
        return Fx, Fy, Fz, Gx, Gy, Gz, vx, vy, vz

    def pipeline(btilde):
        dt = btilde.dtype
        if dt not in built:
            built[dt] = build(dt)
        Fx, Fy, Fz, Gx, Gy, Gz, vx, vy, vz = built[dt]
        prec = precision

        if not is_3d:
            # 2D: squeeze the size-1 z batch and run a plain matmul chain —
            # measured 25% faster than the batched einsums at 2048² (the
            # MXU tiles unbatched (ny, nx) GEMMs better).
            b = btilde[0]
            a = jnp.matmul(b, Fx.T, precision=prec)          # (ny, mx)
            a = jnp.matmul(Fy, a, precision=prec)            # (my, mx)
            # device-side broadcast (np here would bake an (ny, nx)
            # constant into the HLO — 16 MB at 2048²)
            a = a / (jnp.asarray(vy)[:, None] + jnp.asarray(vx)[None, :])
            a = jnp.matmul(Gy, a, precision=prec)            # (ny, mx)
            a = jnp.matmul(a, Gx.T, precision=prec)          # (ny, nx)
            return a[None]

        a = jnp.einsum("ax,zyx->zya", Fx, btilde, precision=prec)
        a = jnp.einsum("by,zyx->zbx", Fy, a, precision=prec)
        a = jnp.einsum("cz,zyx->cyx", Fz, a, precision=prec)
        # Build λ on device from the three small vectors — a numpy
        # broadcast here would materialize an (nz, ny, nx) CONSTANT in
        # the HLO (512 MB at 512³), which the remote compile service
        # rejects with HTTP 413.
        lam = (jnp.asarray(vz)[:, None, None]
               + jnp.asarray(vy)[None, :, None]
               + jnp.asarray(vx)[None, None, :])
        a = a / lam
        a = jnp.einsum("ax,zyx->zya", Gx, a, precision=prec)
        a = jnp.einsum("by,zyx->zbx", Gy, a, precision=prec)
        a = jnp.einsum("cz,zyx->cyx", Gz, a, precision=prec)
        return a

    return pipeline


def make_fft_btilde_solver(problem: PoissonProblem,
                           params: PoissonParams = None,
                           precision=lax.Precision.HIGHEST,
                           z_mode: str = "eigen",
                           interpret: bool = False):
    """Raw transform entry for fused producers (the Pallas projection
    kernels emit b̃ = M·p − (ρ/dt)∇·u* directly): (btilde) → x_new.

    ``z_mode``: "eigen" (default) runs every axis as DST matmul passes;
    "tdma" replaces the LAST transform pair with a Pallas Thomas
    line-solve stage — the z axis in 3D (~30% cheaper transform at 512³),
    the y axis in 2D (half the 2D transform's MXU work) — f32 kernels
    with a jnp fallback for other dtypes; "auto" picks tdma when the
    kernel shape qualifies.  ``interpret`` runs the TDMA kernels in
    Pallas interpret mode (CPU tests).
    """
    if not spectral_supported(problem):
        raise ValueError("spectral solver needs nz==1 or (nz>=3, dz>0)")
    if z_mode == "auto":
        if problem.is_3d:
            sup = tdma_z_supported(problem)
        else:
            # Profitability gate: tdma drops the two y-axis matmuls but
            # pads the x pair to Mx; it wins iff 2·Mx < 4·mx (square-ish
            # grids), i.e. padding under 2×.
            mx = problem.nx - 2
            sup = tdma_y_supported(problem) and _ceil_to(mx, 1024) < 2 * mx
            if sup:
                # Accuracy/profit gate #2: on strongly anisotropic grids
                # (dy ≪ dx) every x-mode's y-line is ill-conditioned and
                # the dense rescue covers all columns — the Thomas stage
                # then does no useful work, so keep the eigen path.
                lx = _dirichlet_eigenvalues(mx, problem.inv_dx2)
                sup = _tdma2d_rescue_width(
                    mx, lx, float(problem.inv_dy2)) < mx
        z_mode = "tdma" if sup else "eigen"
    if z_mode == "tdma":
        if problem.is_3d:
            if not tdma_z_supported(problem):
                raise ValueError("tdma z_mode unsupported for this problem")
            return jax.jit(_make_btilde_pipeline_tdma(problem, precision,
                                                      interpret=interpret))
        if not tdma_y_supported(problem):
            raise ValueError("tdma y-stage unsupported for this problem")
        return jax.jit(_make_btilde_pipeline_tdma2d(problem, precision,
                                                    interpret=interpret))
    return jax.jit(_make_btilde_pipeline(problem, precision))


def make_btilde_pipeline_sharded(problem: PoissonProblem, axis_name: str,
                                 n_shards: int, dtype=jnp.float32,
                                 precision=lax.Precision.HIGHEST):
    """Pencil-transpose distributed DST for use *inside* ``shard_map``.

    The TPU-native answer to the reference's missing MPI layer
    (`ROADMAP.md:88`, SURVEY §2.9) for the spectral pressure solve: fields
    are z-decomposed over ``n_shards`` devices on mesh axis ``axis_name``;
    each transform stage is a local MXU einsum and the two re-shardings
    between z-pencils and x-pencils are ``all_to_all``s over ICI:

        z-pencil:  DSTx, DSTy          (local matmuls — x, y unsharded)
        all_to_all: split spectral-x, gather z   → x-pencil
        x-pencil:  DSTz, ÷λ, DSTz⁻¹    (local — z now unsharded)
        all_to_all: split z, gather spectral-x   → z-pencil
        z-pencil:  DSTy⁻¹, DSTx⁻¹      (local)

    The spectral-x axis is zero-padded from mx = nx−2 up to a multiple of
    ``n_shards`` (zero forward rows → zero coefficients; padded eigenvalues
    are 1 so 0/1 stays 0; zero inverse columns drop them), keeping the
    all_to_all split exact for any nx.

    Returns ``fn(btilde_local) -> x_local`` mapping the local
    (nz/P, ny, nx) zero-shell b̃ block to the local solution block with its
    Neumann mirror shell in place (same contract as
    :func:`make_fft_btilde_solver`, judged shard-wise).
    """
    if not spectral_supported(problem) or not problem.is_3d:
        raise ValueError("sharded spectral solver needs a 3D problem "
                         "(nz>=3, dz>0)")
    P = int(n_shards)
    if problem.nz % P != 0:
        raise ValueError(f"nz={problem.nz} not divisible by {P} shards")

    nx, ny, nz = problem.nx, problem.ny, problem.nz
    mx, my, mz = nx - 2, ny - 2, nz - 2
    mxp = ((mx + P - 1) // P) * P          # padded spectral-x size
    chunk = mxp // P

    lx = np.ones(mxp)
    lx[:mx] = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    lz = _dirichlet_eigenvalues(mz, problem.inv_dz2)
    scale = (2.0 / (mx + 1)) * (2.0 / (my + 1)) * (2.0 / (mz + 1))

    def pad_cols(S):
        return np.pad(S, ((0, 0), (1, 1)))

    # Forward: zero-padded rows on x (extra modes are identically zero).
    Fx = jnp.asarray(np.pad(pad_cols(_sine_matrix(mx)),
                            ((0, mxp - mx), (0, 0))), dtype)
    Fy = jnp.asarray(pad_cols(_sine_matrix(my)), dtype)
    Fz = jnp.asarray(pad_cols(_sine_matrix(mz)), dtype)
    # Inverse: mirror-extended, zero-padded columns on x; scale folds into Gx.
    Gx = jnp.asarray(np.pad(_mirror_extended_inverse(mx, scale),
                            ((0, 0), (0, mxp - mx))), dtype)
    Gy = jnp.asarray(_mirror_extended_inverse(my, 1.0), dtype)
    Gz = jnp.asarray(_mirror_extended_inverse(mz, 1.0), dtype)
    vx = jnp.asarray(lx, dtype)
    vy = jnp.asarray(ly, dtype)
    vz = jnp.asarray(lz, dtype)

    def pipeline(btilde_local):
        prec = precision
        idx = lax.axis_index(axis_name)
        a = jnp.einsum("ax,zyx->zya", Fx, btilde_local, precision=prec)
        a = jnp.einsum("by,zyx->zbx", Fy, a, precision=prec)
        # z-pencil → x-pencil: split spectral-x into P chunks, gather z.
        a = lax.all_to_all(a, axis_name, split_axis=2, concat_axis=0,
                           tiled=True)
        a = jnp.einsum("cz,zyx->cyx", Fz, a, precision=prec)
        vx_local = lax.dynamic_slice(vx, (idx * chunk,), (chunk,))
        lam = (vz[:, None, None] + vy[None, :, None]
               + vx_local[None, None, :])
        a = a / lam
        a = jnp.einsum("cz,zyx->cyx", Gz, a, precision=prec)
        # x-pencil → z-pencil: split z, gather spectral-x.
        a = lax.all_to_all(a, axis_name, split_axis=0, concat_axis=2,
                           tiled=True)
        a = jnp.einsum("by,zyx->zbx", Gy, a, precision=prec)
        a = jnp.einsum("ax,zyx->zya", Gx, a, precision=prec)
        return a

    return pipeline


def make_btilde_pipeline_sharded_zy(problem: PoissonProblem,
                                    n_z: int, n_y: int, dtype=jnp.float32,
                                    axis_z: str = "z", axis_y: str = "y",
                                    precision=lax.Precision.HIGHEST):
    """Two-axis pencil-transpose distributed DST for (z, y)-decomposed 3D
    fields inside ``shard_map`` — the pod-scale generalization of
    :func:`make_btilde_pipeline_sharded` (which shards z only).

    Fields are decomposed (nz/Pz, ny/Py, nx) over a 2D device mesh; every
    transform stage is a local MXU einsum and four ``all_to_all``s re-pencil
    between stages (vs two in the 1D version):

        block:     DSTx                           (x local)
        a2a over z: split spectral-x, gather z    → z-pencil
        z-pencil:  DSTz                           (z local)
        a2a over y: split spectral-z, gather y    → y-pencil
        y-pencil:  DSTy, ÷λ, DSTy⁻¹               (y local)
        a2a over y: split y, gather spectral-z
        z-pencil:  DSTz⁻¹
        a2a over z: split z, gather spectral-x
        block:     DSTx⁻¹

    The spectral-x axis zero-pads to a multiple of ``Pz`` and the
    spectral-z axis to a multiple of ``Py`` (zero forward rows → zero
    coefficients; padded eigenvalues are 1 so 0/1 stays 0; zero inverse
    columns drop them), keeping every split exact for any grid size.

    Returns ``fn(btilde_local) -> x_local`` mapping the local
    (nz/Pz, ny/Py, nx) zero-shell b̃ block to the local solution block with
    its Neumann mirror shell in place.
    """
    if not spectral_supported(problem) or not problem.is_3d:
        raise ValueError("zy-sharded spectral solver needs a 3D problem "
                         "(nz>=3, dz>0)")
    Pz, Py = int(n_z), int(n_y)
    if problem.nz % Pz != 0:
        raise ValueError(f"nz={problem.nz} not divisible by {Pz} z-shards")
    if problem.ny % Py != 0:
        raise ValueError(f"ny={problem.ny} not divisible by {Py} y-shards")

    nx, ny, nz = problem.nx, problem.ny, problem.nz
    mx, my, mz = nx - 2, ny - 2, nz - 2
    mxp = ((mx + Pz - 1) // Pz) * Pz       # padded spectral-x size
    mzp = ((mz + Py - 1) // Py) * Py       # padded spectral-z size
    cx = mxp // Pz
    cz = mzp // Py

    lx = np.ones(mxp)
    lx[:mx] = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    lz = np.ones(mzp)
    lz[:mz] = _dirichlet_eigenvalues(mz, problem.inv_dz2)
    scale = (2.0 / (mx + 1)) * (2.0 / (my + 1)) * (2.0 / (mz + 1))

    def pad_cols(S):
        return np.pad(S, ((0, 0), (1, 1)))

    Fx = jnp.asarray(np.pad(pad_cols(_sine_matrix(mx)),
                            ((0, mxp - mx), (0, 0))), dtype)
    Fy = jnp.asarray(pad_cols(_sine_matrix(my)), dtype)
    Fz = jnp.asarray(np.pad(pad_cols(_sine_matrix(mz)),
                            ((0, mzp - mz), (0, 0))), dtype)
    Gx = jnp.asarray(np.pad(_mirror_extended_inverse(mx, scale),
                            ((0, 0), (0, mxp - mx))), dtype)
    Gy = jnp.asarray(_mirror_extended_inverse(my, 1.0), dtype)
    Gz = jnp.asarray(np.pad(_mirror_extended_inverse(mz, 1.0),
                            ((0, 0), (0, mzp - mz))), dtype)
    vx = jnp.asarray(lx, dtype)
    vy = jnp.asarray(ly, dtype)
    vz = jnp.asarray(lz, dtype)

    def a2a(a, name, split, concat):
        """tiled all_to_all, identity on singleton mesh axes (which
        lax.all_to_all rejects when the axis size divides oddly… and is
        pure overhead anyway)."""
        n = Pz if name == axis_z else Py
        if n == 1:
            return a
        return lax.all_to_all(a, name, split_axis=split, concat_axis=concat,
                              tiled=True)

    def pipeline(btilde_local):
        prec = precision
        zi = lax.axis_index(axis_z)
        yi = lax.axis_index(axis_y)
        a = jnp.einsum("ax,zyx->zya", Fx, btilde_local, precision=prec)
        a = a2a(a, axis_z, 2, 0)                 # (nz, ny/Py, cx)
        a = jnp.einsum("cz,zyx->cyx", Fz, a, precision=prec)
        a = a2a(a, axis_y, 0, 1)                 # (cz, ny, cx)
        a = jnp.einsum("by,zyx->zbx", Fy, a, precision=prec)
        vz_loc = lax.dynamic_slice(vz, (yi * cz,), (cz,))
        vx_loc = lax.dynamic_slice(vx, (zi * cx,), (cx,))
        lam = (vz_loc[:, None, None] + vy[None, :, None]
               + vx_loc[None, None, :])
        a = a / lam
        a = jnp.einsum("by,zyx->zbx", Gy, a, precision=prec)
        a = a2a(a, axis_y, 1, 0)                 # (mzp, ny/Py, cx)
        a = jnp.einsum("cz,zyx->cyx", Gz, a, precision=prec)
        a = a2a(a, axis_z, 0, 2)                 # (nz/Pz, ny/Py, mxp)
        a = jnp.einsum("ax,zyx->zya", Gx, a, precision=prec)
        return a

    return pipeline


def make_btilde_pipeline_sharded_2d(problem: PoissonProblem, axis_name: str,
                                    n_shards: int, dtype=jnp.float32,
                                    precision=lax.Precision.HIGHEST):
    """Pencil-transpose distributed DST for 2D grids inside ``shard_map``.

    The 2D twin of :func:`make_btilde_pipeline_sharded`: fields are
    y-decomposed over ``n_shards`` devices; DSTx is local (x unsharded),
    then one ``all_to_all`` re-shards to x-pencils (y gathered) for DSTy,
    the eigenvalue division, and DSTy⁻¹, and a second ``all_to_all``
    returns to y-pencils for DSTx⁻¹.  The spectral-x axis zero-pads up to a
    multiple of ``n_shards`` exactly as in 3D.

    Returns ``fn(btilde_local) -> x_local`` mapping the local (1, ny/P, nx)
    zero-shell b̃ block to the local solution block with its Neumann mirror
    shell in place.
    """
    if not spectral_supported(problem) or problem.is_3d:
        raise ValueError("2D sharded spectral solver needs nz == 1")
    P = int(n_shards)
    if problem.ny % P != 0:
        raise ValueError(f"ny={problem.ny} not divisible by {P} shards")

    nx, ny = problem.nx, problem.ny
    mx, my = nx - 2, ny - 2
    mxp = ((mx + P - 1) // P) * P
    chunk = mxp // P

    lx = np.ones(mxp)
    lx[:mx] = _dirichlet_eigenvalues(mx, problem.inv_dx2)
    ly = _dirichlet_eigenvalues(my, problem.inv_dy2)
    scale = (2.0 / (mx + 1)) * (2.0 / (my + 1))

    def pad_cols(S):
        return np.pad(S, ((0, 0), (1, 1)))

    Fx = jnp.asarray(np.pad(pad_cols(_sine_matrix(mx)),
                            ((0, mxp - mx), (0, 0))), dtype)
    Fy = jnp.asarray(pad_cols(_sine_matrix(my)), dtype)
    Gx = jnp.asarray(np.pad(_mirror_extended_inverse(mx, scale),
                            ((0, 0), (0, mxp - mx))), dtype)
    Gy = jnp.asarray(_mirror_extended_inverse(my, 1.0), dtype)
    vx = jnp.asarray(lx, dtype)
    vy = jnp.asarray(ly, dtype)

    def pipeline(btilde_local):
        prec = precision
        idx = lax.axis_index(axis_name)
        a = btilde_local[0]                                # (ny/P, nx)
        a = jnp.einsum("ax,yx->ya", Fx, a, precision=prec)  # (ny/P, mxp)
        # y-pencil → x-pencil: split spectral-x, gather y.
        a = lax.all_to_all(a, axis_name, split_axis=1, concat_axis=0,
                           tiled=True)                     # (ny, chunk)
        a = jnp.einsum("by,yx->bx", Fy, a, precision=prec)  # (my, chunk)
        vx_local = lax.dynamic_slice(vx, (idx * chunk,), (chunk,))
        a = a / (vy[:, None] + vx_local[None, :])
        a = jnp.einsum("by,yx->bx", Gy, a, precision=prec)  # (ny, chunk)
        # x-pencil → y-pencil: split y, gather spectral-x.
        a = lax.all_to_all(a, axis_name, split_axis=0, concat_axis=1,
                           tiled=True)                     # (ny/P, mxp)
        a = jnp.einsum("ax,yx->ya", Gx, a, precision=prec)  # (ny/P, nx)
        return a[None]

    return pipeline


def make_fft_direct(problem: PoissonProblem, params: PoissonParams,
                    precision=lax.Precision.HIGHEST,
                    compute_residuals: bool = True):
    """Build the direct solve: (x0, rhs) → PoissonResult (always 1 "iteration").

    Drop-in replacement for :func:`make_cg`'s return — same signature, same
    fixed point, ``status == CONVERGED``.

    ``precision`` controls the sine-matrix contractions: ``HIGHEST`` (default)
    keeps float32 solves near 1e-6 relative residual; ``HIGH`` halves the MXU
    cost at ~1e-4–1e-5 accuracy (still far tighter than a truncated CG).
    ``compute_residuals=True`` (default) measures the true final residual
    with one diagnostic Laplacian sweep; ``False`` skips it for hot inner
    loops where the exactness of the direct method is already established.
    A direct method never forms an initial residual, so
    ``initial_residual`` always reports 0.
    """
    if not spectral_supported(problem):
        raise ValueError("spectral solver needs nz==1 or (nz>=3, dz>0)")
    is_3d = problem.is_3d
    mx, my = problem.nx - 2, problem.ny - 2
    mz = problem.nz - 2 if is_3d else 1

    cx = _face_coeff(mx, problem.inv_dx2)
    cy = _face_coeff(my, problem.inv_dy2)
    cz = (_face_coeff(mz, problem.inv_dz2) if is_3d else np.zeros(1))

    pipeline = _make_btilde_pipeline(problem, precision)
    fx = np.pad(cx, 1)
    fy = np.pad(cy, 1)
    fz = np.pad(cz, 1) if is_3d else np.zeros(1)

    def face_rhs(x, rhs, dt):
        """Full-shape b̃ = face_coeff·x − rhs, zero shell."""
        coeff = (jnp.asarray(fz, dt)[:, None, None]
                 + jnp.asarray(fy, dt)[None, :, None]
                 + jnp.asarray(fx, dt)[None, None, :])
        return problem.zero_boundary(coeff * x - rhs)

    def solve(x, rhs):
        x_new = pipeline(face_rhs(x, rhs, x.dtype))

        if compute_residuals:
            # CG-convention residual: the converged interior inside the
            # *initial* mirror shell (CG measures its recursion residual
            # before the post-loop Neumann refresh, `linear_solver_cg.c:441`).
            # With x_new's own refreshed shell the quantity is legitimately
            # nonzero even at the exact fixed point.
            x_hybrid = problem.set_interior(problem.neumann_bc(x), x_new)
            r_f = problem.zero_boundary(problem.laplacian(x_hybrid) - rhs)
            final_res = jnp.sqrt(problem.dot_interior(r_f, r_f))
        else:
            final_res = jnp.zeros((), x.dtype)
        return PoissonResult(x=x_new, iterations=jnp.int32(1),
                             initial_residual=jnp.zeros((), x.dtype),
                             final_residual=final_res,
                             status=jnp.int32(PoissonStatus.CONVERGED))

    return jax.jit(solve)
