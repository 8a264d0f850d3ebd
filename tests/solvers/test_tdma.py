"""TDMA z-stage of the spectral Poisson solve (`ops/pallas/tdma.py`).

The Thomas z-line solve is mathematically identical to the eigen (z-DST)
pipeline — both solve the same per-mode tridiagonal exactly — so the
tests pin (1) the scan reference against a dense solve, (2) the Pallas
kernel (interpret mode) against the reference, and (3) the full
transform pipeline against the eigen pipeline at f32-rounding tolerance.
Reference operator: `/root/reference/lib/include/cfd/math/stencils.h:135-176`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.ops.pallas.tdma import (make_tdma_y_2d, make_tdma_z,
                                     tdma2d_supported, tdma_supported,
                                     tdma_z_reference)
from cfd_tpu.solvers.poisson.base import PoissonProblem
from cfd_tpu.solvers.poisson.spectral import (make_fft_btilde_solver,
                                              tdma_y_supported,
                                              tdma_z_supported)


def _dense_solve(r, mu, w):
    nz = r.shape[0]
    mz = nz - 2
    x = np.zeros_like(r)
    for j in range(r.shape[1]):
        for i in range(r.shape[2]):
            A = (np.diag(np.full(mz, mu[j, i] + 2 * w))
                 + np.diag(np.full(mz - 1, -w), 1)
                 + np.diag(np.full(mz - 1, -w), -1))
            x[1:-1, j, i] = np.linalg.solve(A, r[1:-1, j, i])
    x[0] = x[1]
    x[-1] = x[-2]
    return x


@pytest.mark.parametrize("nz", [3, 4, 7, 18])
def test_reference_matches_dense(nz):
    rng = np.random.default_rng(0)
    my, mx = 8, 128
    r = np.zeros((nz, my, mx))
    r[1:-1] = rng.standard_normal((nz - 2, my, mx))
    mu = rng.uniform(0.5, 80.0, (my, mx))
    w = 11.0
    got = np.asarray(tdma_z_reference(jnp.asarray(r), jnp.asarray(mu), w))
    want = _dense_solve(r, mu, w)
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=5e-6 * np.abs(want).max())


@pytest.mark.parametrize("variant", ["stored", "analytic"])
@pytest.mark.parametrize("nz", [3, 4, 9, 34])
def test_kernel_matches_reference(nz, variant):
    my, mx = 16, 128
    assert tdma_supported(nz, my, mx)
    rng = np.random.default_rng(nz)
    r = np.zeros((nz, my, mx), np.float32)
    r[1:-1] = rng.standard_normal((nz - 2, my, mx)).astype(np.float32)
    # mu spanning small (smooth modes) to stiff columns
    mu = np.exp(rng.uniform(np.log(1e-2), np.log(1e3), (my, mx)))
    w = 123.4
    fn = make_tdma_z(nz, my, mx, mu, w, jnp.float32, variant=variant,
                     interpret=True)
    got = np.asarray(fn(jnp.asarray(r)))
    # tight vs the f32 scan twin (the stored variant is the same
    # arithmetic; analytic differs only in how t_k is obtained) ...
    f32ref = np.asarray(tdma_z_reference(
        jnp.asarray(r), jnp.asarray(mu, jnp.float32), np.float32(w)))
    scale = np.abs(f32ref).max()
    np.testing.assert_allclose(got, f32ref, rtol=0, atol=5e-6 * scale)
    # ... and loose vs f64 truth (plain f32 Thomas rounding)
    if jax.config.jax_enable_x64:
        truth = np.asarray(tdma_z_reference(
            jnp.asarray(r, jnp.float64), jnp.asarray(mu, jnp.float64),
            float(w)))
        np.testing.assert_allclose(got, truth, rtol=0, atol=2e-5 * scale)


@pytest.mark.parametrize("variant", ["stored", "analytic"])
@pytest.mark.parametrize("nz", [3, 9, 34])
def test_bwd_only_matches_full_solve(nz, variant):
    """make_tdma_z_bwd on pre-swept (d′, t) planes (the fused-predictor
    layout: plane k at index k, zero shells) reproduces the full
    make_tdma_z solve, and the jnp bwd reference matches too."""
    from cfd_tpu.ops.pallas.tdma import (make_tdma_z_bwd,
                                         tdma_z_bwd_reference)

    my, mx = 16, 128
    rng = np.random.default_rng(nz)
    r = np.zeros((nz, my, mx), np.float32)
    r[1:-1] = rng.standard_normal((nz - 2, my, mx)).astype(np.float32)
    mu = np.exp(rng.uniform(np.log(1e-2), np.log(1e3), (my, mx)))
    w = 123.4
    want = np.asarray(make_tdma_z(nz, my, mx, mu, w, jnp.float32,
                                  variant=variant,
                                  interpret=True)(jnp.asarray(r)))

    # forward sweep in f32 (same arithmetic as the kernels), fused layout
    t = np.zeros((nz, my, mx), np.float32)
    d = np.zeros((nz, my, mx), np.float32)
    mu32, w32 = mu.astype(np.float32), np.float32(w)
    tk = dk = np.zeros((my, mx), np.float32)
    for k in range(1, nz - 1):
        rec = np.float32(1.0) / (mu32 + 2 * w32 - w32 * tk)
        tk = w32 * rec
        dk = (r[k] + w32 * dk) * rec
        t[k], d[k] = tk, dk

    bwd = make_tdma_z_bwd(nz, my, mx, mu, w, jnp.float32,
                          variant=variant, interpret=True)
    args = (jnp.asarray(d), jnp.asarray(t)) if variant == "stored" \
        else (jnp.asarray(d),)
    got = np.asarray(bwd(*args))
    scale = max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6 * scale)

    ref = np.asarray(tdma_z_bwd_reference(jnp.asarray(d), jnp.asarray(t)))
    np.testing.assert_allclose(ref, want, rtol=0, atol=5e-6 * scale)


def test_unsupported_shapes():
    assert not tdma_supported(2, 8, 128)    # no interior plane
    assert not tdma_supported(8, 8, 100)    # lanes not 128-aligned
    assert not tdma_supported(8, 9, 128)    # sublanes not 8-aligned


@pytest.mark.parametrize("shape,dz", [((16, 10, 130), 0.07),
                                      ((8, 34, 258), 0.11)])
def test_pipeline_matches_eigen(shape, dz):
    nz, ny, nx = shape
    p = PoissonProblem(nx, ny, nz, 0.05, 0.03, dz)
    assert tdma_z_supported(p)
    eig = make_fft_btilde_solver(p)
    td = make_fft_btilde_solver(p, z_mode="tdma", interpret=True)
    rng = np.random.default_rng(7)
    bt = np.zeros(shape, np.float32)
    bt[1:-1, 1:-1, 1:-1] = rng.standard_normal(
        (nz - 2, ny - 2, nx - 2)).astype(np.float32)
    xe = np.asarray(eig(jnp.asarray(bt)))
    xt = np.asarray(td(jnp.asarray(bt)))
    np.testing.assert_allclose(xt, xe, rtol=0,
                               atol=5e-6 * np.abs(xe).max())


def test_pipeline_auto_and_guards():
    p2d = PoissonProblem(130, 34, 1, 0.05, 0.03, 0.0)
    assert not tdma_z_supported(p2d)
    assert tdma_y_supported(p2d)          # the 2D y-stage covers this shape
    # ... but auto still picks eigen below the profitability threshold
    # (Mx pads 128 → 1024, ≥ 2× — the padded x matmuls would cost more
    # than the dropped y pair)
    fn = make_fft_btilde_solver(p2d, z_mode="auto")
    bt = np.zeros((1, 34, 130), np.float32)
    assert np.asarray(fn(jnp.asarray(bt))).shape == (1, 34, 130)
    # explicit tdma on a shape whose VMEM working set can't fit
    p_huge = PoissonProblem(4098, 30000, 1, 0.05, 0.03, 0.0)
    assert not tdma_y_supported(p_huge)
    with pytest.raises(ValueError):
        make_fft_btilde_solver(p_huge, z_mode="tdma")


# ---------------------------------------------------------------------------
# 2D y-stage (VMEM-resident whole-array kernel)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ny", [3, 4, 9, 13, 34, 513])
def test_tdma2d_kernel_matches_reference(ny):
    # ny=13 -> mz=11 -> (n_main=1, rem=3) and ny=513 -> mz=511 ->
    # (n_main=63, rem=7): both fori_loop blocks AND a nonzero static tail
    # in the same sweep — the configuration real 2^k+1 grids hit, which
    # the original {3,4,9,34} set never exercised (round-3 advice).
    mxp = 1024
    assert tdma2d_supported(ny, mxp)
    rng = np.random.default_rng(ny)
    r = np.zeros((ny, mxp), np.float32)
    r[1:-1] = rng.standard_normal((ny - 2, mxp)).astype(np.float32)
    mu = np.exp(rng.uniform(np.log(1e-2), np.log(1e3), mxp))
    w = 123.4
    fn = make_tdma_y_2d(ny, mxp, mu, w, jnp.float32, interpret=True)
    got = np.asarray(fn(jnp.asarray(r)))
    f32ref = np.asarray(tdma_z_reference(
        jnp.asarray(r[:, None, :]),
        jnp.asarray(mu, jnp.float32)[None, :], np.float32(w)))[:, 0, :]
    scale = np.abs(f32ref).max()
    if jax.config.jax_enable_x64:
        # Long ill-conditioned chains (ny=513 with mu=1e-2 columns: Thomas
        # recurrence condition ~2w/mu ~ 2.5e4) accumulate ~2e-4*scale of
        # legitimate f32 rounding on ANY f32 path; the kernel's rounding
        # path differs from the scan's, so anchor both bounds to the f32
        # scan's own measured error against f64 truth instead of a fixed
        # constant (measured at ny=513: ref 2.2e-4, kernel 2.5e-4 rel).
        truth = np.asarray(tdma_z_reference(
            jnp.asarray(r[:, None, :], jnp.float64),
            jnp.asarray(mu, jnp.float64)[None, :], float(w)))[:, 0, :]
        err_ref = np.abs(f32ref - truth).max()
        np.testing.assert_allclose(got, truth, rtol=0,
                                   atol=max(2e-5 * scale, 2 * err_ref))
        np.testing.assert_allclose(got, f32ref, rtol=0,
                                   atol=max(5e-6 * scale, 2 * err_ref))
    else:
        np.testing.assert_allclose(got, f32ref, rtol=0, atol=5e-6 * scale)


def test_tdma2d_unsupported_shapes():
    assert not tdma2d_supported(2, 1024)     # no interior row
    assert not tdma2d_supported(8, 512)      # Mx below a full plane-view
    assert not tdma2d_supported(8, 1536)     # Mx/8 not 128-aligned


def test_pipeline2d_hybrid_rescue_accuracy():
    """The 2D TDMA-y stage sees per-mode recurrence condition ~4w/λx[m]
    (only ONE transformed axis, unlike 3D's λx+λy), so a plain f32 Thomas
    sweep loses ~3 digits on the smooth modes at production sizes
    (measured 1.3e-3 max-rel at 1026² vs eigen's 1.7e-6).  The pipeline
    densely re-solves the K ill-conditioned columns via the y-DST pair;
    this pins the hybrid's error vs f64 truth at eigen class."""
    n = 1026
    p = PoissonProblem(n, n, 1, 1.0 / (n - 1), 1.0 / (n - 1), 0.0)
    assert tdma_y_supported(p)
    rng = np.random.default_rng(n)
    bt = np.zeros((1, n, n), np.float64)
    bt[:, 1:-1, 1:-1] = rng.standard_normal((n - 2, n - 2))
    eig = make_fft_btilde_solver(p)
    td = make_fft_btilde_solver(p, z_mode="tdma", interpret=True)
    truth = np.asarray(eig(jnp.asarray(bt)))          # f64 eigen
    got = np.asarray(td(jnp.asarray(bt, jnp.float32)))
    scale = np.abs(truth).max()
    # eigen-f32 measures 1.7e-6 here; plain (unrescued) TDMA 1.3e-3
    np.testing.assert_allclose(got, truth, rtol=0, atol=5e-6 * scale)


def test_pipeline2d_anisotropic_full_rescue():
    """dy ≪ dx drives every x-mode's y-line condition 4·inv_dy2/λx[m]
    past the rescue threshold (K == mx): "auto" must keep the eigen path
    (the Thomas stage would do no useful work there), and a *forced* tdma
    build must degenerate to the full dense y-solve instead of silently
    skipping the rescue (the old `K < mx` guard returned the unrescued
    ~1e-3 Thomas result exactly on the most ill-conditioned grids)."""
    from cfd_tpu.solvers.poisson.spectral import (_dirichlet_eigenvalues,
                                                  _tdma2d_rescue_width)
    n = 258
    dy = 1.0 / 32.0                       # inv_dy2 = 1024 > 256·inv_dx2
    p = PoissonProblem(n, n, 1, 1.0, dy, 0.0)
    assert tdma_y_supported(p)
    mx = n - 2
    lx = _dirichlet_eigenvalues(mx, p.inv_dx2)
    assert _tdma2d_rescue_width(mx, lx, float(p.inv_dy2)) == mx
    rng = np.random.default_rng(7)
    bt = np.zeros((1, n, n), np.float32)
    bt[:, 1:-1, 1:-1] = rng.standard_normal((n - 2, n - 2)
                                            ).astype(np.float32)
    bt = jnp.asarray(bt)
    eig = make_fft_btilde_solver(p)
    xe = np.asarray(eig(bt))
    # forced tdma: the rescue now covers all columns → eigen-class result
    td = make_fft_btilde_solver(p, z_mode="tdma", interpret=True)
    np.testing.assert_allclose(np.asarray(td(bt)), xe, rtol=0,
                               atol=5e-6 * np.abs(xe).max())
    # auto: the K == mx gate rejects tdma, returning the eigen pipeline
    auto = make_fft_btilde_solver(p, z_mode="auto")
    assert np.array_equal(np.asarray(auto(bt)), xe)


@pytest.mark.parametrize("shape", [(34, 130), (9, 258)])
def test_pipeline2d_matches_eigen(shape):
    ny, nx = shape
    p = PoissonProblem(nx, ny, 1, 0.05, 0.03, 0.0)
    assert tdma_y_supported(p)
    eig = make_fft_btilde_solver(p)
    td = make_fft_btilde_solver(p, z_mode="tdma", interpret=True)
    rng = np.random.default_rng(11)
    bt = np.zeros((1, ny, nx), np.float32)
    bt[:, 1:-1, 1:-1] = rng.standard_normal(
        (ny - 2, nx - 2)).astype(np.float32)
    xe = np.asarray(eig(jnp.asarray(bt)))
    xt = np.asarray(td(jnp.asarray(bt)))
    np.testing.assert_allclose(xt, xe, rtol=0,
                               atol=5e-6 * np.abs(xe).max())
