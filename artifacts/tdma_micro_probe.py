"""Micro-probes for the TDMA backward-sweep design on the real chip:

1. accuracy of in-kernel t_k via exp vs expm1 vs f64 host truth
2. effect of plain elementwise kernel BW at this access pattern

Run on the TPU box:  python artifacts/tdma_micro_probe.py

RESULT (2026-08-19, v5e): the expm1 case does not lower — Mosaic has
no expm1 primitive (`NotImplementedError ... KernelType.TC: expm1`),
so the analytic variant keeps exp and its ~4e-6 cancellation error;
"stored" stays the default (bit-identical, 6.42 ms vs analytic 4.73 ms
at 512^3).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print("devices:", jax.devices(), flush=True)
    my = mx = 512
    n = 512
    w = (n - 1.0) ** 2
    i = np.arange(1, n - 1, dtype=np.float64)
    lam = 4.0 * w * np.sin(np.pi * i / (2.0 * (n - 1))) ** 2
    mu = (np.pad(lam, (0, 2), mode="edge")[:, None]
          + np.pad(lam, (0, 2), mode="edge")[None, :])
    s = mu / (2.0 * w)
    sh = np.sqrt(s * (2.0 + s))
    einvphi = 1.0 / (1.0 + s + sh)
    phi2 = 2.0 * np.log1p(s + sh)

    # f64 truth for t_k at a few k
    ks = [1, 2, 5, 17, 128, 509]
    for kind in ("exp", "expm1"):
        worst = 0.0
        for k in ks:
            t64 = (einvphi * np.expm1(-k * phi2)
                   / np.expm1(-(k + 1) * phi2))

            def kern(e_ref, p_ref, o_ref, kind=kind, k=k):
                e = e_ref[...]
                p = p_ref[...]
                kf = jnp.float32(k)
                if kind == "exp":
                    q = jnp.exp(-kf * p)
                    t = e * (q - 1.0) / (q * (e * e) - 1.0)
                else:
                    t = (e * jnp.expm1(-kf * p)
                         / jnp.expm1(-(kf + 1.0) * p))
                o_ref[...] = t

            call = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((my, mx), jnp.float32))
            t32 = np.asarray(call(jnp.asarray(einvphi, jnp.float32),
                                  jnp.asarray(phi2, jnp.float32)))
            err = np.abs(t32 - t64).max()
            worst = max(worst, err)
        print(f"t_k via {kind:6s}: worst abs err {worst:.3e} "
              f"(t in (0,1))", flush=True)


if __name__ == "__main__":
    main()
