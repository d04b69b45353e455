"""Localize the discrete H-conservation jump events (round-5 finding).

probe_nve_lambda_mts.py caught a one-shot ~270 kcal/mol jump in
h_conserved during λ-FROZEN PME NVE (no overflow flag, no dangerous-
build flag) — the same signature class as the campaign's recurring
one-in-~10^6-steps walker NaNs that round 3 blamed on "rebin parking"
without proof (VERDICT r4 weak 4). This probe runs NVE from an
equilibrated state, watches h_conserved at EVERY step, and when a
single-step |ΔH| exceeds the threshold it reports:

  - the exact step index and its phase within the rebuild block
    (jump at a block boundary ⇒ the rebin/monitor is the suspect;
    mid-block ⇒ force/integration),
  - which energy component moved (e_lj / e_coul / e_kspace / KE),
  - molecule-level forensics from the saved pre-event state: the
    pre/post positions of the molecules with the largest single-step
    energy change (re-run one block with per-step state dumps).

Cite: conservation contract of the reference fix's integrator
(fix_constant_pH.cpp:109-117); LAMMPS dangerous-build accounting is the
host-side analog of the drift monitor this probe cross-examines.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12_000)
    ap.add_argument("--chunk", type=int, default=504,
                    help="multiple of rebuild_every")
    ap.add_argument("--thresh", type=float, default=25.0,
                    help="single-step |dH| kcal/mol to flag")
    ap.add_argument("--kspace-every", type=int, default=1)
    ap.add_argument("--dsf", action="store_true",
                    help="DSF electrostatics control (no k-space)")
    ap.add_argument("--lambda-live", action="store_true",
                    help="leave λ dynamics ON during the NVE hunt (the "
                         "measure_nve_drift.py configuration — its "
                         "λ-live PME rows blow up where λ-frozen is "
                         "clean, round 5)")
    ap.add_argument("--rebuild-every", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="examples/results/h_jump_hunt.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cpu = jax.local_devices(backend="cpu")[0]
    n_side = 8 if args.small else 20
    style = (dict(coul_style="dsf", alpha=0.2) if args.dsf
             else dict(coul_style="cut", alpha=0.30))
    with jax.default_device(cpu):
        sys_ = solvated_acid(n_side=n_side, rigid_water=True,
                             lambda_coupled=True, cutoff=8.0, skin=0.8,
                             pH=5.0, hmr=3.0, seed=args.seed, **style)
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    pme = None
    if not args.dsf:
        from constant_ph_tpu.ops.pme import make_pme_params

        pme = make_pme_params(np.asarray(sys_.state.box), ts.params.grid,
                              0.30, skin=0.8, spacing=1.5, p=6)
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0,
                          gamma=0.01, lambda_thermostat="langevin",
                          rebuild_every=8, force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq, kspace_ep=pme)
    tst = jax.device_put(tst, dev)
    tst, _ = jax.jit(eng_eq.make_minimize(300))(tst)
    run_eq = jax.jit(eng_eq.make_run(400))
    for _ in range(4):
        tst, ov, obs = run_eq(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                               jax.device_get(tst)), occ)
    tst = jax.device_put(tst, dev)
    log(f"equilibrated T={float(obs.temp[-1]):.0f}K W={ts.params.W}")

    cfg = EngineConfig(dt=2.0, thermostat="nve", lambda_thermostat="none",
                       lambda_frozen=not args.lambda_live,
                       rebuild_every=args.rebuild_every,
                       kspace_every=args.kspace_every)
    eng = TiledEngine(ts, cfg, kspace_ep=pme)
    assert args.chunk % cfg.rebuild_every == 0
    run = jax.jit(eng.make_run(args.chunk, detailed_flags=True))

    events = []
    st = tst
    done = 0
    k_ev = args.kspace_every
    while done < args.steps:
        st_pre = st                       # replay anchor for this chunk
        st, (ov_c, ov_d), obs = run(st)
        h = np.asarray(obs.h_conserved, np.float64)
        hv = np.asarray(obs.h_valid, bool)
        idx = np.where(hv)[0] if hv.ndim else np.arange(h.size)
        hh = h[idx]
        dh = np.diff(hh)
        bad = np.where(np.abs(dh) > args.thresh)[0]
        for b in bad:
            step_in_chunk = int(idx[b + 1])          # 0-based, post-step
            gstep = done + step_in_chunk
            ev = {
                "global_step": gstep + 1,
                "step_in_chunk": step_in_chunk,
                "phase_in_block": int((step_in_chunk + 1)
                                      % cfg.rebuild_every),
                "dH": float(dh[b]),
                "d_e_lj": float(np.diff(np.asarray(
                    obs.e_lj, np.float64))[idx[b + 1] - 1]),
                "d_e_coul": float(np.diff(np.asarray(
                    obs.e_coul, np.float64))[idx[b + 1] - 1]),
                "d_e_kspace": float(np.diff(np.asarray(
                    obs.e_kspace, np.float64))[idx[b + 1] - 1]),
                "d_ke": float(np.diff(np.asarray(
                    obs.ke, np.float64))[idx[b + 1] - 1]),
                "overflow_cap": bool(np.asarray(ov_c).any()),
                "overflow_drift": bool(np.asarray(ov_d).any()),
            }
            events.append(ev)
            log(f"JUMP {ev}")
            if len(events) == 1:
                # save the replay anchor for molecular forensics
                leaves, _ = jax.tree_util.tree_flatten(
                    jax.device_get(st_pre))
                np.savez(args.out.replace(".json", "_anchor.npz"),
                         chunk_start=done, n_leaves=len(leaves),
                         **{f"leaf{i}": np.asarray(l)
                            for i, l in enumerate(leaves)})
        done += args.chunk
        if done % (args.chunk * 4) == 0:
            log(f"{done} steps, {len(events)} events, "
                f"H={hh[-1]:.2f} T={float(np.asarray(obs.temp)[-1]):.0f}K")
    out = {
        "steps": done, "kspace_every": k_ev, "dsf": args.dsf,
        "rebuild_every": cfg.rebuild_every, "thresh": args.thresh,
        "n_events": len(events), "events": events,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"n_events": len(events),
                      "phases": [e["phase_in_block"] for e in events],
                      "dHs": [round(e["dH"], 1) for e in events]}))


if __name__ == "__main__":
    main()
