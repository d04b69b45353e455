"""Per-component timing of the HEWL-scale config-4 step (27k atoms,
Ns≈224 solute) — the water×solute and bonded shares grow with solute
size, unlike the headline acid system (Ns=8). Informs the next
optimization target (docs/ROADMAP.md item 3)."""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.ops.bonded import bonded_forces
from constant_ph_tpu.systems.protein import solvated_polypeptide
from constant_ph_tpu.tiled import forces as tforces
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import split_system, to_tiled

K = 20


def main():
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_polypeptide(
            n_residues=40, sites_every=2, box_len=66.0, water_spacing=3.1,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=5.0,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.45)
        tst = to_tiled(ts, sys_.state)
    p = ts.params
    gx, gy, gz = p.grid
    W = p.W
    Ns = int(ts.solute.q0.shape[0])
    print(f"atoms={sys_.state.x.shape[0]} grid={p.grid} W={W} Ns={Ns}")
    tst = jax.device_put(tst, jax.devices()[0])
    cfg = EngineConfig(dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", rebuild_every=12)
    eng = TiledEngine(ts, cfg)
    style, alpha, rc = ts.coul_style, ts.alpha, ts.cutoff
    eps = 1e-12

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
        float(run(st))
        return time.perf_counter() - t0

    def profile(name, body):
        t1 = scan_time(body, tst, K)
        t2 = scan_time(body, tst, 2 * K)
        print(f"{name:20s} {(t2 - t1) / K * 1e3:8.3f} ms/iter", flush=True)

    def ww(st):
        wxg = st.wx.reshape(3, gx, gy, gz, 3 * W)
        e_lj, e_c, f = tforces.water_water_fast(
            wxg, ts.water, p, st.box, style=style, alpha=alpha, rc=rc)
        fst = jnp.stack([jnp.reshape(fd, (p.G, 3 * W)) for fd in f])
        return st.replace(wx=st.wx + eps * fst), e_lj + e_c

    def ws(st):
        wxg = st.wx.reshape(3, gx, gy, gz, 3 * W)
        wvg = st.wvalid.reshape(gx, gy, gz, W)
        qs = eng.charges_solute(st.lam)
        out = tforces.water_solute_fast(
            wxg, wvg, st.sx, qs, ts.solute, ts.water, p, st.box,
            style=style, alpha=alpha, rc=rc)
        return st.replace(sx=st.sx + eps * out[3]), out[0] + out[1]

    def ss(st):
        qs = eng.charges_solute(st.lam)
        out = tforces.solute_solute(st.sx, qs, ts.solute, st.box,
                                    style=style, alpha=alpha, rc=rc)
        return st.replace(sx=st.sx + eps * out[2]), out[0] + out[1]

    def bond(st):
        eb, fb, _ = bonded_forces(st.sx, st.box, ts.bonded)
        return st.replace(sx=st.sx + eps * fb), eb

    def step(st):
        frc = eng.compute_forces(st)
        st2, frc2 = eng.step(st, frc)
        return st2, frc2.e_pot

    profile("water_water_fast", ww)
    profile("water_solute_fast", ws)
    profile("solute_solute", ss)
    profile("bonded", bond)
    profile("full_step(2x forces)", step)


if __name__ == "__main__":
    main()
