"""Probe: even/odd-folded DST-I pipeline vs the current dense einsum chain.

The DST-I matrix has the reflection symmetry S[a, m-1-b] = (-1)^a S[a, b],
so each dense contraction can split into two half-size contractions on the
folded inputs x± = x_first ± reverse(x_second) — an exact 2x FLOP cut on
every MXU pass (valuable at Precision.HIGHEST where each f32 matmul costs
6 bf16 passes).  The open question is whether the extra butterfly passes
(HBM traffic) eat the gain; this probe measures both variants end-to-end
on the real chip at 512^3.

Run on the TPU box:  python artifacts/dst_fold_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 512
M = N - 2
H = N // 2          # input fold half (N even)
PREC = lax.Precision.HIGHEST


def sine(m):
    a = np.arange(1, m + 1, dtype=np.float64)
    return np.sin(np.pi * np.outer(a, a) / (m + 1))


def build(dtype=np.float32):
    S = sine(M)
    Spad = np.pad(S, ((0, 0), (1, 1)))              # (M, N)
    scale = (2.0 / (M + 1)) ** 3
    G = np.concatenate([S[:1], S, S[-1:]], 0)       # (N, M) mirror-extended
    lam = 4.0 * np.sin(np.pi * np.arange(1, M + 1) / (2 * (M + 1))) ** 2

    full = dict(
        F=np.asarray(Spad, dtype),
        Gs=np.asarray(G * scale, dtype),            # fold all scale into one
        G=np.asarray(G, dtype),
        lam=lam,
    )
    folded = dict(
        Fe=np.asarray(Spad[0::2, :H], dtype),       # (255, 256)
        Fo=np.asarray(Spad[1::2, :H], dtype),
        Ge=np.asarray(G[:H, 0::2], dtype),          # (256, 255)
        Go=np.asarray(G[:H, 1::2], dtype),
        Ges=np.asarray(G[:H, 0::2] * scale, dtype),
        Gos=np.asarray(G[:H, 1::2] * scale, dtype),
        lam_e=lam[0::2], lam_o=lam[1::2],
    )
    return full, folded


FULL, FOLD = build()

EINSUM = {2: "ax,zyx->zya", 1: "by,zyx->zbx", 0: "cz,zyx->cyx"}


def contract(Mtx, a, axis):
    return jnp.einsum(EINSUM[axis], Mtx, a, precision=PREC)


def pipeline_full(b):
    F, Gs, G = (jnp.asarray(FULL[k]) for k in ("F", "Gs", "G"))
    lam = FULL["lam"]
    a = contract(F, b, 2)
    a = contract(F, a, 1)
    a = contract(F, a, 0)
    v = jnp.asarray(lam, b.dtype)
    a = a / (v[:, None, None] + v[None, :, None] + v[None, None, :])
    a = contract(Gs, a, 2)
    a = contract(G, a, 1)
    a = contract(G, a, 0)
    return a


def split_fold(a, axis):
    lo = [slice(None)] * 3
    hi = [slice(None)] * 3
    lo[axis] = slice(0, H)
    hi[axis] = slice(H, N)
    rev = jnp.flip(a[tuple(hi)], axis)
    head = a[tuple(lo)]
    return head + rev, head - rev


def fwd_axis(blocks, axis, Fe, Fo):
    out = {}
    for k, a in blocks.items():
        p, m_ = split_fold(a, axis)
        out[k + ("e",)] = contract(Fe, p, axis)
        out[k + ("o",)] = contract(Fo, m_, axis)
    return out


def inv_axis(blocks, axis, Ge, Go):
    # Parities are appended x, y, z and removed in the same order, so the
    # parity being merged is always at key position 0.
    pos = 0
    out = {}
    for k, ye in blocks.items():
        if k[pos] != "e":
            continue
        ko = k[:pos] + ("o",) + k[pos + 1:]
        u = contract(Ge, ye, axis)
        v = contract(Go, blocks[ko], axis)
        merged = jnp.concatenate([u + v, jnp.flip(u - v, axis)], axis)
        out[k[:pos] + k[pos + 1:]] = merged
    return out


def pipeline_folded(b):
    Fe, Fo = jnp.asarray(FOLD["Fe"]), jnp.asarray(FOLD["Fo"])
    Ge, Go = jnp.asarray(FOLD["Ge"]), jnp.asarray(FOLD["Go"])
    Ges, Gos = jnp.asarray(FOLD["Ges"]), jnp.asarray(FOLD["Gos"])
    lam = {"e": FOLD["lam_e"], "o": FOLD["lam_o"]}

    blocks = {(): b}
    blocks = fwd_axis(blocks, 2, Fe, Fo)   # keys: (px,)
    blocks = fwd_axis(blocks, 1, Fe, Fo)   # keys: (px, py)
    blocks = fwd_axis(blocks, 0, Fe, Fo)   # keys: (px, py, pz)
    out = {}
    for (px, py, pz), a in blocks.items():
        vz = jnp.asarray(lam[pz], b.dtype)
        vy = jnp.asarray(lam[py], b.dtype)
        vx = jnp.asarray(lam[px], b.dtype)
        out[(px, py, pz)] = a / (vz[:, None, None] + vy[None, :, None]
                                 + vx[None, None, :])
    blocks = inv_axis(out, 2, Ges, Gos)    # keys: (py, pz)
    blocks = inv_axis(blocks, 1, Ge, Go)   # keys: (pz,)
    blocks = inv_axis(blocks, 0, Ge, Go)   # keys: ()
    return blocks[()]


def timed(fn, b, s_pair=(2, 12)):
    @jax.jit
    def many(b, eps_arr):
        def body(tot, eps):
            r = fn(b * (1.0 + eps))
            return tot + r[1, 1, 1], 0
        tot, _ = lax.scan(body, jnp.float32(0.0), eps_arr)
        return tot

    meas = {}
    for S in s_pair:
        eps = jnp.linspace(0.0, 1e-4, S).astype(jnp.float32)
        float(many(b, eps))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(b, eps))
            best = min(best, time.perf_counter() - t0)
        meas[S] = best
    s1, s2 = s_pair
    return (meas[s2] - meas[s1]) / (s2 - s1) * 1e3


def main():
    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def make_b():
        # Build on device — a host->device transfer of 512 MB over the
        # remote tunnel takes minutes.
        b = jax.random.normal(jax.random.PRNGKey(0), (N, N, N), jnp.float32)
        iz = lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)
        iy = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
        ix = lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
        interior = ((iz > 0) & (iz < N - 1) & (iy > 0) & (iy < N - 1)
                    & (ix > 0) & (ix < N - 1))
        return jnp.where(interior, b, 0.0)

    b = make_b()
    b.block_until_ready()
    print("input built", flush=True)

    # correctness first (small grid on CPU-side comparison is in tests;
    # here compare the two variants against each other on-chip)
    @jax.jit
    def diff(b):
        y_full = pipeline_full(b)
        y_fold = pipeline_folded(b)
        return (jnp.max(jnp.abs(y_full - y_fold)),
                jnp.max(jnp.abs(y_full)))

    d, r = (float(v) for v in diff(b))
    print(f"max|full-folded| = {d:.3e}  (max|full| = {r:.3e})", flush=True)

    t_full = timed(pipeline_full, b)
    print(f"full   pipeline: {t_full:8.2f} ms/solve", flush=True)
    t_fold = timed(pipeline_folded, b)
    print(f"folded pipeline: {t_fold:8.2f} ms/solve   "
          f"speedup {t_full / t_fold:.3f}x", flush=True)


if __name__ == "__main__":
    main()
