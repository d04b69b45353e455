"""Measure the BASELINE.json config family on the real chip.

Config 3: full Ewald long-range electrostatics with reciprocal dU/dλ.
Config 4: HEWL-scale multi-site polypeptide (~20k atoms, 16 λ sites).

Prints ms/step and ns/day (dt=2 fs) per config. The headline config
(24k-atom solvated acid, DSF) lives in bench.py.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.ops.ewald import make_ewald_params
from constant_ph_tpu.systems.protein import solvated_polypeptide
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def equilibrate_and_retile(sys_, ts, tst, dev):
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng = TiledEngine(ts, cfg_eq)
    tst, _ = jax.jit(eng.make_minimize(400))(tst)
    run = jax.jit(eng.make_run(200))
    for _ in range(5):
        tst, ov, obs = run(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # margin_min=4 valid for the short (~1 ps) measurement window;
        # long production runs use the elastic loop (tiled/elastic.py)
        ts, tst = retile_auto(
            ts, jax.tree.map(jnp.asarray, jax.device_get(tst)), occ,
            margin_min=4)
    log(f"equilibrated T={float(obs.temp[-1]):.0f}K, retiled occ {occ} "
        f"-> W {ts.params.W}")
    return ts, jax.device_put(tst, dev)


def measure(eng, tst, dt, n_blocks=40):
    block = eng.cfg.rebuild_every
    run_block = jax.jit(eng.make_run(block))
    tst, ov, obs = run_block(tst)
    for _ in range(2):
        tst, ov, obs = run_block(tst)
    jax.block_until_ready
    float(obs.temp[-1])
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        tst, ov, obs = run_block(tst)
    ok = bool(jnp.isfinite(obs.h_conserved).all()) and not bool(ov)
    wall = time.perf_counter() - t0
    ms = wall / (n_blocks * block) * 1e3
    nsday = (n_blocks * block * dt / 1e6) / (wall / 86400.0)
    return ms, nsday, ok, float(obs.temp[-1])


def main():
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    dt = 2.0

    with jax.default_device(cpu):
        # ≥25k atoms (HEWL scale, BASELINE config 4) in a box that lands on
        # a 6³ cell grid (cell 11 Å ≥ cutoff+skin+2·mol_radius = 10.54 Å) —
        # pair work scales as N²/G, so hitting the next grid size matters
        sys_ = solvated_polypeptide(
            n_residues=40, sites_every=2, box_len=66.0, water_spacing=3.1,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=5.0,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    n = sys_.state.x.shape[0]
    n_sites = sys_.spec.n_sites
    log(f"polypeptide: {n} atoms, {n_sites} sites, grid {ts.params.grid}")
    tst = jax.device_put(tst, dev)
    ts, tst = equilibrate_and_retile(sys_, ts, tst, dev)

    cfg = EngineConfig(dt=dt, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", rebuild_every=12)
    eng = TiledEngine(ts, cfg)
    ms, nsday, ok, T = measure(eng, tst, dt)
    print(f"config4 polypeptide DSF: {ms:.2f} ms/step  {nsday:.1f} ns/day "
          f"(finite={ok}, T={T:.0f}K)")

    # k-space configs need a CONSISTENT Ewald split: real-space erfc
    # screening at the SAME alpha as the reciprocal term (coul_style
    # "cut" + alpha = the Ewald real-space kernel), not the DSF pair
    # params the config-4 system was built with. Rebuild the pair tables
    # at matching alpha and carry the equilibrated positions over.
    from constant_ph_tpu.ops.pme import make_pme_params
    from constant_ph_tpu.tiled.layout import retile, to_canonical

    state_eq = to_canonical(ts, jax.tree.map(jnp.asarray,
                                             jax.device_get(tst)))
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())

    def rebuilt(alpha):
        with jax.default_device(cpu):
            sk = solvated_polypeptide(
                n_residues=40, sites_every=2, box_len=66.0,
                water_spacing=3.1, cutoff=8.0, skin=0.8,
                coul_style="cut", alpha=alpha, pH=5.0)
            tsk = split_system(sk, skin=0.8, tile_safety=1.72)
            tstk = to_tiled(tsk, state_eq)
            if tsk.params.W > ts.params.W:
                tsk, tstk = retile(tsk, tstk, ts.params.W)
        return tsk, jax.device_put(tstk, dev)

    ts_ew, tst_ew = rebuilt(0.35)
    ep = make_ewald_params(np.asarray(sys_.state.box), 0.35, accuracy=1e-5)
    eng_ew = TiledEngine(ts_ew, cfg, kspace_ep=ep)
    ms, nsday, ok, T = measure(eng_ew, tst_ew, dt)
    print(f"config3 polypeptide Ewald(a=0.35): {ms:.2f} ms/step  "
          f"{nsday:.1f} ns/day (finite={ok}, T={T:.0f}K)")

    # tuned via examples/probe_pme_params.py: alpha=0.30 + 1.5 A mesh has
    # the same force accuracy vs the factorized-Ewald oracle (6.7e-5 rel)
    # as alpha=0.35 + 1.0 A, at ~20% less step time
    ts_pm, tst_pm = rebuilt(0.30)
    pp = make_pme_params(np.asarray(sys_.state.box), ts_pm.params.grid, 0.30,
                         spacing=1.5, p=6, skin=0.8)
    log(f"PME mesh {pp.mesh} (per-cell {pp.m}, halo {pp.h})")
    for k_ev in (1, 2, 3):
        cfg_k = EngineConfig(dt=dt, thermostat="langevin", T=300.0,
                             gamma=0.002, lambda_thermostat="langevin",
                             rebuild_every=12, kspace_every=k_ev)
        eng_pm = TiledEngine(ts_pm, cfg_k, kspace_ep=pp)
        ms, nsday, ok, T = measure(eng_pm, tst_pm, dt)
        print(f"config3 polypeptide PME(a=0.30, 1.5A, p=6, "
              f"kspace_every={k_ev}): {ms:.2f} ms/step  "
              f"{nsday:.1f} ns/day (finite={ok}, T={T:.0f}K)")


if __name__ == "__main__":
    main()
