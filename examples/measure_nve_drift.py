"""Energy-conservation quality metric at headline conditions: NVE drift
of the 24k-atom rigid-SPC/E + λ-coupled system at dt=2 fs (HMR) over
50 ps on the real chip. MD practitioners quote drift in kT/atom/ns (or
kcal/mol/atom/ns); well-behaved f32 GPU/TPU MD engines land well under
1e-3 kT/atom/ns-scale budgets at production timesteps.

Default is the DSF config (the round-1 BASELINE row). --pme measures the
bench.py headline electrostatics (rc=8 / alpha=0.30 / 48^3 mesh / p=6);
--kspace-every k adds the Verlet-I impulse MTS split, with the H(t) fit
restricted to k-space boundary rows (obs.h_valid — off-boundary rows
carry a stale reciprocal term by construction, engine.py).

Ref: the k-space accuracy contract the reference inherits from LAMMPS
(/root/reference/fix_constant_pH.cpp:241-253).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu import units
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=25_000)
    ap.add_argument("--pme", action="store_true",
                    help="headline PME electrostatics instead of DSF")
    ap.add_argument("--kspace-every", type=int, default=1,
                    help="reciprocal-space impulse MTS stride (PME only)")
    ap.add_argument("--dg-ref", type=float, default=None,
                    help="install this ΔG_ref before the NVE leg; "
                         "'nan' => quick TI calibration. Without it the "
                         "spec's default (0) leaves the λ landscape "
                         "tilted by the FULL charging free energy "
                         "(≈112 kcal/mol under PME on this system) — λ "
                         "then slams the stiff walls and the drift "
                         "measures that pathology, not the integrator "
                         "(round-5 forensics, results/fd_dudl_check / "
                         "nve_drift_pme_k1). Default: calibrate.")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    n_steps = args.steps
    style = (dict(coul_style="cut", alpha=0.30) if args.pme
             else dict(coul_style="dsf", alpha=0.2))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=20, rigid_water=True, lambda_coupled=True,
            cutoff=8.0, skin=0.8, pH=5.0, hmr=3.0, **style,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)
    n_atoms = sys_.state.x.shape[0]
    kspace_ep = None
    k_ev = 1
    if args.pme:
        from constant_ph_tpu.ops.pme import make_pme_params
        kspace_ep = make_pme_params(np.asarray(sys_.state.box),
                                    ts.params.grid, 0.30, skin=0.8,
                                    spacing=1.5, p=6)
        k_ev = args.kspace_every
        log(f"PME mesh {kspace_ep.mesh} kspace_every={k_ev}")

    # thermalize with Langevin, then switch the thermostat OFF
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq, kspace_ep=kspace_ep)
    tst, _ = jax.jit(eng_eq.make_minimize(400))(tst)
    run_eq = jax.jit(eng_eq.make_run(400))
    for _ in range(4):
        tst, ov, obs = run_eq(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                               jax.device_get(tst)), occ)
    tst = jax.device_put(tst, dev)
    log(f"equilibrated T={float(obs.temp[-1]):.0f}K, W={ts.params.W}")

    # balance the λ landscape before measuring: with the spec default
    # ΔG_ref = 0 the λ potential is tilted by the full charging free
    # energy and the "drift" measures λ slamming its walls, not the
    # integrator (see --dg-ref help)
    dg = args.dg_ref
    if dg is None:
        from constant_ph_tpu import titration
        dg = float(titration.calibrate_dG_ref_tiled(
            ts, tst, cfg_eq, kspace_ep=kspace_ep,
            equil_steps=400, sample_steps=1600, call_steps=2000))
        log(f"TI-calibrated dG_ref = {dg:.2f} kcal/mol")
    ts = ts.replace(spec=ts.spec.replace(
        dG_ref=jnp.full_like(ts.spec.dG_ref, dg)))

    cfg = EngineConfig(dt=2.0, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=12, kspace_every=k_ev)
    eng = TiledEngine(ts, cfg, kspace_ep=kspace_ep)
    chunk = 2500
    run = jax.jit(eng.make_run(chunk))
    hs, ts_ps = [], []
    done = 0
    overflow_any = False
    while done < n_steps:
        tst, ov, obs = run(tst)
        overflow_any = overflow_any or bool(ov)
        done += chunk
        # mean of the last valid H rows: under impulse MTS only k-space
        # boundary steps carry an exact conserved quantity (h_valid)
        h = np.asarray(obs.h_conserved, np.float64)
        valid = np.asarray(obs.h_valid, bool)
        h = h[valid] if valid.ndim else h
        hs.append(float(np.mean(h[-500:])))
        ts_ps.append(done * cfg.dt / 1000.0)
        log(f"{done} steps: H={hs[-1]:.2f} T={float(obs.temp[-1]):.0f}K")
    # linear fit of H(t) over the run
    coef = np.polyfit(np.asarray(ts_ps), np.asarray(hs), 1)
    drift_per_ns = coef[0] * 1000.0                 # kcal/mol per ns
    kT = units.BOLTZ * 300.0
    result = {
        "n_atoms": n_atoms,
        "ps": done * cfg.dt / 1000.0,
        "dt_fs": cfg.dt,
        "electrostatics": (f"PME rc=8/a=0.30/48^3/p=6 kspace_every={k_ev}"
                           if args.pme else "DSF rc=8/a=0.2"),
        "drift_kcalmol_per_ns": drift_per_ns,
        "drift_kT_per_atom_per_ns": drift_per_ns / kT / n_atoms,
        "overflow": overflow_any,
        "dG_ref": dg,
        "lambda_inner": cfg.lambda_inner,
        "H_first": hs[0], "H_last": hs[-1],
    }
    dst = args.out or (
        f"examples/results/nve_drift_pme_k{k_ev}_v5e.json" if args.pme
        else "examples/results/nve_drift_v5e.json")
    with open(dst, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
