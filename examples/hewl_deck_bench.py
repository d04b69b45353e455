"""Config-4 numbers from a LAMMPS data file (VERDICT r1 next #5).

Synthesizes a full HEWL-scale deck (all bonded sections, titratable
carboxylate residues, SPC/E solvent with SHAKE-style water topology) via
systems.protein + write_lammps_data, then runs the production pipeline
exactly the way the reference's ecosystem would
(fix_constant_pH.cpp:15-25 — a data-file-driven host):

    read_data (native C++ parser w/ Python fallback)
      → system_from_lammps_data → split_system → TiledEngine → measure

    python examples/hewl_deck_bench.py [--steps 480] [--cpu] [--small]

Writes examples/results/hewl_deck_bench_v5e.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=480)
    ap.add_argument("--rebuild-every", type=int, default=12)
    ap.add_argument("--pme", action="store_true",
                    help="full electrostatics: smooth PME (alpha=0.30, "
                         "p=6) + kspace_every impulse MTS — the bench.py "
                         "headline config, here driven from a data file")
    ap.add_argument("--kspace-every", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--deck", default="/tmp/hewl_like.data")
    ap.add_argument("--out",
                    default="examples/results/hewl_deck_bench_v5e.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.systems.lammps_data import (
        read_lammps_data, sites_from_json, system_from_lammps_data,
        write_lammps_data, write_sites_json)
    from constant_ph_tpu.systems.protein import solvated_polypeptide
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled

    t0 = time.time()
    cpu = jax.local_devices(backend="cpu")[0]

    # PME pairs Ewald-screened real space (coul_style="cut" + alpha=0.30)
    # with the reciprocal mesh; DSF is self-contained at alpha=0.2
    style = dict(coul_style="cut", alpha=0.30) if args.pme else \
        dict(coul_style="dsf", alpha=0.2)
    build = dict(n_residues=40, sites_every=2, box_len=66.0,
                 water_spacing=3.1, cutoff=8.0, skin=0.8,
                 pH=5.0, **style)
    if args.small:
        build.update(n_residues=8, box_len=26.0, water_spacing=3.4,
                     cutoff=6.0, skin=1.2)

    # ---- synthesize the deck (host side) ----
    with jax.default_device(cpu):
        sys_src = solvated_polypeptide(**build)
    sidecar = args.deck + ".sites.json"
    write_lammps_data(args.deck, sys_src)
    write_sites_json(sidecar, sys_src)
    nbytes = os.path.getsize(args.deck)
    log(f"deck written: {args.deck} ({nbytes/1e6:.1f} MB, "
        f"{sys_src.state.x.shape[0]} atoms) in {time.time()-t0:.0f}s")

    # ---- the data-file path: parse → System → tiles ----
    t1 = time.time()
    raw = read_lammps_data(args.deck)   # exercises the native parser
    parse_s = time.time() - t1
    log(f"parsed {raw['x'].shape[0]} atoms, {raw['bonds'].shape[0]} bonds, "
        f"{raw['angles'].shape[0]} angles in {parse_s:.2f}s")
    with jax.default_device(cpu):
        sys_ = system_from_lammps_data(
            args.deck, cutoff=build["cutoff"], skin=build["skin"],
            rigid_water_types=(6, 7),
            titratable_sites=sites_from_json(sidecar), pH=build["pH"],
            **style)
        ts = split_system(sys_, skin=build["skin"], tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    n_atoms = sys_.state.x.shape[0]
    S = int(np.asarray(ts.spec.pK).shape[0]) if ts.spec is not None else 0
    log(f"tiled: grid {ts.params.grid} W {ts.params.W}, {S} λ sites")

    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)

    kspace_ep = None
    k_ev = 1
    if args.pme:
        from constant_ph_tpu.ops.pme import make_pme_params
        kspace_ep = make_pme_params(np.asarray(sys_.state.box),
                                    ts.params.grid, build["alpha"],
                                    skin=build["skin"], spacing=1.5, p=6)
        k_ev = args.kspace_every
        log(f"PME mesh {kspace_ep.mesh} p=6 alpha={build['alpha']} "
            f"kspace_every={k_ev}")

    # ---- minimize + equilibrate + retile (same recipe as bench.py) ----
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq, kspace_ep=kspace_ep)
    tst, e_hist = jax.jit(eng_eq.make_minimize(400))(tst)
    log(f"minimized: E {float(e_hist[0]):.0f} -> {float(e_hist[-1]):.0f}")
    run_eq = jax.jit(eng_eq.make_run(200))
    for _ in range(4):
        tst, ov, obs = run_eq(tst)
    jax.block_until_ready(tst.wx)
    log(f"equilibrated: T={float(obs.temp[-1]):.0f}K overflow={bool(ov)}")
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                               jax.device_get(tst)), occ,
                              margin_min=4)
    tst = jax.device_put(tst, dev)
    log(f"retiled: occ {occ} -> W {ts.params.W}")

    # ---- production measurement ----
    dt = 2.0
    cfg = EngineConfig(dt=dt, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin",
                       rebuild_every=args.rebuild_every,
                       kspace_every=k_ev)
    eng = TiledEngine(ts, cfg, kspace_ep=kspace_ep)
    run_block = jax.jit(eng.make_run(cfg.rebuild_every))
    tst, ov, obs = run_block(tst)
    jax.block_until_ready(tst.wx)
    for _ in range(2):
        tst, ov, obs = run_block(tst)
    jax.block_until_ready(tst.wx)
    n_blocks = max(1, args.steps // cfg.rebuild_every)
    t2 = time.perf_counter()
    for _ in range(n_blocks):
        tst, ov, obs = run_block(tst)
    jax.block_until_ready(tst.wx)
    wall = time.perf_counter() - t2
    n_meas = n_blocks * cfg.rebuild_every
    ms_step = 1e3 * wall / n_meas
    ns_day = (n_meas * dt / 1e6) / (wall / 86400.0)
    ok = bool(jnp.isfinite(obs.h_conserved).all()) and not bool(ov)
    log(f"{n_meas} steps in {wall:.2f}s = {ms_step:.2f} ms/step "
        f"({ns_day:.1f} ns/day) finite={ok}")

    # titration smoke from deck input: λ dynamics are live (the sites
    # came from the data-file sidecar, not the procedural builder) —
    # λ must move under the thermostat and dU/dλ must stay finite
    lam_tr = np.asarray(obs.lam, np.float64)          # (steps, S)
    dudl = np.asarray(obs.dUdlam, np.float64)
    titr = {
        "lam_mean": float(lam_tr[-1].mean()),
        "lam_rms_motion": float(np.sqrt(np.mean(
            (lam_tr[-1] - lam_tr[0]) ** 2))),
        "dUdlam_finite": bool(np.isfinite(dudl).all()),
        "dUdlam_last_mean": float(dudl[-1].mean()),
    }
    log(f"titration smoke: lam rms motion {titr['lam_rms_motion']:.4f}, "
        f"dU/dlam finite={titr['dUdlam_finite']}")

    out = {
        "system": {"atoms": int(n_atoms), "sites": S,
                   "deck_bytes": nbytes, "source": "lammps data file"},
        "parse_s": parse_s,
        "ms_per_step": round(ms_step, 3),
        "ns_per_day": round(ns_day, 2),
        "dt_fs": dt,
        "rebuild_every": cfg.rebuild_every,
        "electrostatics": (f"PME kspace_every={k_ev}" if args.pme
                           else "DSF rc=8"),
        "titration_smoke": titr,
        "finite": ok,
        "wall_s": time.time() - t0,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
