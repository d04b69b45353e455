"""Why does λ-live NVE blow up under PME impulse MTS?

Round-5 finding to isolate: measure_nve_drift --pme went NaN at
kspace_every=2 within 2500 steps and drifted 0.073 kT/atom/ns at k=1,
while (a) the round-2 probe (λ FROZEN, probe_kspace_mts.py) measured
finite 2.1e-3 / 3.3e-2 drifts at the same configs and (b) the
thermostatted longrun at k=2 is stable for 100+ ps. The new variable is
the LIVE, unthermostatted λ walker. This probe runs the 2x2 matrix
(kspace_every in {1,2}) x (lambda frozen / live-NVE) for a few thousand
steps each and logs λ, v_λ, T and the conserved quantity per 500 steps
— enough to tell whether the λ oscillator is pumped by the mollified
stale-φ reciprocal force (off-boundary steps reuse the previous
boundary's φ_recip for dU/dλ, tiled/engine.py compute_forces) or the
blowup lives elsewhere.

Reference contract being probed: the fix's kspace coupling
(fix_constant_pH.cpp:241-253) assumes the λ force is consistent with
the integrated Hamiltonian at every step.
"""
from __future__ import annotations

import dataclasses
import json
import sys

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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default="examples/results/"
                                     "nve_lambda_mts_probe.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cpu = jax.local_devices(backend="cpu")[0]
    n_side = 8 if args.small else 20
    with jax.default_device(cpu):
        sys_ = solvated_acid(n_side=n_side, rigid_water=True,
                             lambda_coupled=True, cutoff=8.0, skin=0.8,
                             pH=5.0, hmr=3.0, coul_style="cut", alpha=0.30)
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst0 = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    from constant_ph_tpu.ops.pme import make_pme_params

    pme = make_pme_params(np.asarray(sys_.state.box), ts.params.grid,
                          0.30, skin=0.8, spacing=1.5, p=6)
    # shared thermalization (Langevin), then NVE variants from one state
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0,
                          gamma=0.01, lambda_thermostat="langevin",
                          rebuild_every=8, force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq, kspace_ep=pme)
    tst = jax.device_put(tst0, dev)
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

    results = {}
    kT = units.BOLTZ * 300.0
    n_atoms = sys_.state.x.shape[0]
    for k_ev in (1, 2):
        for frozen in (True, False):
            name = f"k{k_ev}_{'frozen' if frozen else 'live'}"
            cfg = EngineConfig(dt=2.0, thermostat="nve",
                               lambda_thermostat="none",
                               lambda_frozen=frozen,
                               rebuild_every=12, kspace_every=k_ev)
            eng = TiledEngine(ts, cfg, kspace_ep=pme)
            run = jax.jit(eng.make_run(args.chunk))
            st = tst
            rows = []
            for i in range(args.steps // args.chunk):
                st, ov, obs = run(st)
                h = np.asarray(obs.h_conserved, np.float64)
                hv = np.asarray(obs.h_valid, bool)
                h = h[hv] if hv.ndim else h
                lam = float(np.asarray(st.lam).reshape(-1)[0])
                vl = float(np.asarray(st.v_lam).reshape(-1)[0])
                kel = 0.5 * units.MVV2E * float(
                    np.asarray(ts.spec.m_lambda).reshape(-1)[0]) * vl * vl
                rows.append(dict(
                    step=(i + 1) * args.chunk,
                    H=float(np.mean(h[-50:])) if h.size else float("nan"),
                    T=float(np.asarray(obs.temp)[-1]),
                    lam=lam, v_lam=vl, ke_lam_kcal=kel,
                    overflow=bool(np.asarray(ov).any())))
                log(f"{name} {rows[-1]}")
                if not np.isfinite(lam):
                    break
            hs = [r["H"] for r in rows if np.isfinite(r["H"])]
            drift = (np.polyfit(np.arange(len(hs)), hs, 1)[0]
                     / (args.chunk * cfg.dt * 1e-6)  # per ns
                     if len(hs) > 2 else float("nan"))
            results[name] = dict(
                rows=rows,
                drift_kT_per_atom_per_ns=float(drift / kT / n_atoms),
                finite=bool(np.isfinite([r["lam"] for r in rows]).all()))
            log(f"{name}: drift {results[name]['drift_kT_per_atom_per_ns']:.2e} "
                f"kT/atom/ns finite={results[name]['finite']}")
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: dict(
        drift=v["drift_kT_per_atom_per_ns"], finite=v["finite"])
        for k, v in results.items()}))


if __name__ == "__main__":
    main()
