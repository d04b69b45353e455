"""Ewald-split sweep for the PME headline (VERDICT r1 item 3).

The measured k=1→k=2 MTS delta showed the reciprocal term is only
~0.7 ms of the 4.25 ms PME step — the REAL-SPACE erfc pair work at
rc=8 Å dominates. Real-space cost on the tiled path scales with cell
volume (cost ∝ N·27·cell³·ρ), and the cell edge is quantized by
cell ≥ rc + skin + 2·mol_radius (tiled/layout.make_tile_params), so the
lever is the grid JUMP: rc=8.0→grid 6³ (cell 11.0 Å) vs rc≤6.6→grid 7³
(cell 9.43 Å) on the 66 Å box — 37% less candidate-pair work.

Each rung keeps the real-space truncation profile fixed (α·rc ≈ 2.4,
the accepted rc=8/α=0.30 point) and re-derives the mesh for the larger
α; accuracy is measured, not assumed: PME forces vs the factorized-Ewald
oracle at the SAME α on the SAME pair tables (so the error isolates the
mesh approximation). Standard PME practice accepts 1e-4..1e-3 relative;
the VERDICT target is ≤1e-4.

Note the LJ cutoff rides the coulomb rc on the tiled path (one stencil);
rc=6.6 truncates SPC/E O-O LJ where (σ/r)⁶≈0.013 — shifted, standard
for 6.5-8 Å water setups, but a model change vs rc=8, so both rows are
reported and BASELINE.md records the rc of the adopted headline.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.ops.ewald import make_ewald_params
from constant_ph_tpu.ops.pme import make_pme_params
from constant_ph_tpu.systems.protein import solvated_polypeptide
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import (retile_auto, split_system,
                                          to_canonical, to_tiled)


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def measure(eng, tst, dt, n_blocks=30):
    block = eng.cfg.rebuild_every
    run_block = jax.jit(eng.make_run(block))
    tst, ov, obs = run_block(tst)
    tst, ov, obs = run_block(tst)
    float(obs.temp[-1])
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        tst, ov, obs = run_block(tst)
    ok = bool(jnp.isfinite(obs.h_conserved).all()) and not bool(
        np.asarray(ov).any())
    wall = time.perf_counter() - t0
    return wall / (n_blocks * block) * 1e3, ok, float(obs.temp[-1])


def main():
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    dt = 2.0
    small = "--small" in sys.argv   # CPU smoke: tiny box, 1 block

    build = dict(n_residues=40, sites_every=2, box_len=66.0,
                 water_spacing=3.1, pH=5.0)
    if small:
        build.update(n_residues=4, box_len=30.0, water_spacing=3.6)

    # equilibrate ONCE at the rc=8 DSF point, carry positions to each rung
    with jax.default_device(cpu):
        sys_ = solvated_polypeptide(cutoff=8.0, skin=0.8, coul_style="dsf",
                                    alpha=0.2, **build)
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    log(f"{sys_.state.x.shape[0]} atoms, eq grid {ts.params.grid}")
    tst = jax.device_put(tst, dev)
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng = TiledEngine(ts, cfg_eq)
    tst, _ = jax.jit(eng.make_minimize(400))(tst)
    run = jax.jit(eng.make_run(200))
    for _ in range(2 if small else 5):
        tst, ov, obs = run(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(
            ts, jax.tree.map(jnp.asarray, jax.device_get(tst)), occ,
            margin_min=4)
    tst = jax.device_put(tst, dev)
    state_eq = to_canonical(ts, jax.tree.map(jnp.asarray,
                                             jax.device_get(tst)))
    log(f"equilibrated, W={ts.params.W}")
    box = np.asarray(sys_.state.box)

    def rebuilt(rc, skin, alpha):
        with jax.default_device(cpu):
            sk = solvated_polypeptide(cutoff=rc, skin=skin,
                                      coul_style="cut", alpha=alpha, **build)
            tsk = split_system(sk, skin=skin, tile_safety=1.72)
            tstk = to_tiled(tsk, state_eq)
        occ = int(np.asarray(tstk.wvalid).sum(axis=1).max())
        with jax.default_device(cpu):
            tsk, tstk = retile_auto(tsk, tstk, occ, margin_min=4)
        return tsk, jax.device_put(tstk, dev)

    def force_err(eng_k, eng_ref, tst):
        f1 = jax.jit(lambda s: eng_k.compute_forces(s).fw)(tst)
        f0 = jax.jit(lambda s: eng_ref.compute_forces(s).fw)(tst)
        d = np.asarray(f1 - f0, np.float64)
        r = np.asarray(f0, np.float64)
        return float(np.sqrt((d ** 2).mean()) / np.sqrt((r ** 2).mean()))

    # (rc, skin, alpha, spacing, p): alpha·rc ≈ 2.4 everywhere
    rungs = [
        (8.0, 0.8, 0.300, 1.5, 6),    # the accepted round-2 point
        (6.6, 0.8, 0.364, 1.3, 6),    # grid jump 6³→7³, finer mesh
        (6.6, 0.8, 0.364, 1.3, 4),    # cheaper spline order
        (6.2, 0.8, 0.387, 1.2, 6),    # deeper rc, same grid 7³
    ]
    if "--phase2" in sys.argv:
        # phase-1 findings: k=2 is the honest MTS level (k=3 heats,
        # 6 fs outer impulse vs ~10 fs water libration); at k=2 the p=4
        # spline is 0.7 ms/step cheaper than p=6 but frel 8.8e-4 at
        # spacing 1.3. Spline error ~ h^p: buy accuracy with mesh, pay
        # in FFT (cheap, pow-2-friendly sizes), keep the cheap spread.
        rungs = [
            (6.6, 0.8, 0.364, 0.70, 4),   # mesh 96³: 8.8e-4·(.70/1.18)⁴≈1.1e-4
            (6.6, 0.8, 0.364, 0.55, 4),   # mesh 128³ (pow-2): ~4e-5
            (6.6, 0.8, 0.364, 1.03, 6),   # mesh 64³ (pow-2): frel ~6e-5
            (6.6, 0.8, 0.364, 0.83, 5),   # mesh 80³, mid spline
        ]
    if small:
        rungs = rungs[:2]
    for rc, skin, alpha, spacing, p in rungs:
        tsk, tstk = rebuilt(rc, skin, alpha)
        pp = make_pme_params(box, tsk.params.grid, alpha, spacing=spacing,
                             p=p, skin=skin)
        ep = make_ewald_params(box, alpha, accuracy=1e-5)
        cfg = EngineConfig(dt=dt, thermostat="langevin", T=300.0,
                           gamma=0.002, lambda_thermostat="langevin",
                           rebuild_every=12)
        err = force_err(TiledEngine(tsk, cfg, kspace_ep=pp),
                        TiledEngine(tsk, cfg, kspace_ep=ep), tstk)
        ks = (1,) if small else ((1, 2) if "--phase2" in sys.argv
                                 else (1, 2, 3))
        for k_ev in ks:
            cfg_k = EngineConfig(dt=dt, thermostat="langevin", T=300.0,
                                 gamma=0.002, lambda_thermostat="langevin",
                                 rebuild_every=12, kspace_every=k_ev)
            eng_k = TiledEngine(tsk, cfg_k, kspace_ep=pp)
            ms, ok, T = measure(eng_k, tstk, dt,
                                n_blocks=2 if small else 30)
            print(f"rc={rc} grid={tsk.params.grid} W={tsk.params.W} "
                  f"alpha={alpha} mesh={pp.mesh} p={p} k={k_ev}: "
                  f"{ms:.2f} ms/step  {dt * 86.4 / ms:.1f} ns/day  "
                  f"frel={err:.2e} finite={ok} T={T:.0f}K", flush=True)


if __name__ == "__main__":
    main()
