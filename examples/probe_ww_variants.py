"""A/B probe: half-stencil (two reduction axes) vs full-stencil
(i-side-only, one reduction axis) merged-lane water-water block.

The half stencil does the ideal amount of pair math but needs both a
lane-axis and a sublane-axis reduction of the same pair intermediate; if
XLA recomputes the elementwise chain once per reduction axis, its real
cost doubles and the full stencil (2x pairs, one reduction) should match
or beat it. Run on the real chip; also checks numerical parity.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled import forces as tforces
from constant_ph_tpu.tiled.layout import split_system, to_tiled

K = 20


def main():
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=20, rigid_water=True, lambda_coupled=True,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=5.0,
            hmr=3.0,
        )
        # tile_safety 1.45 → W=60: near the PRODUCTION tiling (bench.py
        # retiles to occ+margin ≈ 56 after equilibration; 1.35 overflows
        # at build because the initial lattice is not perfectly uniform)
        ts = split_system(sys_, skin=0.8, tile_safety=1.45)
        tst = to_tiled(ts, sys_.state)
    p = ts.params
    gx, gy, gz = p.grid
    W = p.W
    print(f"grid={p.grid} W={W} A={3*W}")
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)
    style, alpha, rc = ts.coul_style, ts.alpha, ts.cutoff

    def make(full, kc=None, kl=None):
        def body(st):
            wxg = st.wx.reshape(3, gx, gy, gz, 3 * W)
            e_lj, e_c, f = tforces.water_water_fast(
                wxg, ts.water, p, st.box, style=style, alpha=alpha, rc=rc,
                full_stencil=full, chunk_k_coul=kc, chunk_k_lj=kl)
            fstack = jnp.stack(
                [jnp.reshape(fd, (p.G, 3 * W)) for fd in f])
            st2 = st.replace(wx=st.wx + 1e-12 * fstack)
            return st2, e_lj + e_c
        return body

    def scan_time(body, st, k):
        @jax.jit
        def run(st):
            def f(carry, _):
                s, acc = carry
                s2, val = body(s)
                return (s2, acc + val), None
            (s_f, acc), _ = jax.lax.scan(f, (st, jnp.zeros(())), None,
                                         length=k)
            return acc
        float(run(st))
        t0 = time.perf_counter()
        v = float(run(st))
        assert v == v
        return time.perf_counter() - t0

    # parity first
    half = jax.jit(make(False))(tst)
    full = jax.jit(make(True))(tst)
    np.testing.assert_allclose(float(half[1]), float(full[1]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(half[0].wx), np.asarray(full[0].wx), atol=1e-10)
    print("parity OK")

    variants = [("half_auto", make(False)), ("full_auto", make(True))]
    for kc in (1, 2, 3, 5, 7, 14):
        variants.append((f"half_kc{kc}", make(False, kc=kc)))
    for name, body in variants:
        t1 = scan_time(body, tst, K)
        t2 = scan_time(body, tst, 2 * K)
        print(f"{name:14s} {(t2 - t1) / K * 1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
