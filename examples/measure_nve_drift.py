"""Energy-conservation quality metric at headline conditions: NVE drift
of the 24k-atom rigid-SPC/E + λ-coupled DSF system at dt=2 fs (HMR) over
50 ps on the real chip. MD practitioners quote drift in kT/atom/ns (or
kcal/mol/atom/ns); well-behaved f32 GPU/TPU MD engines land well under
1e-3 kT/atom/ns-scale budgets at production timesteps.
"""
from __future__ import annotations

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
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=20, rigid_water=True, lambda_coupled=True,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=5.0,
            hmr=3.0,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)
    n_atoms = sys_.state.x.shape[0]

    # thermalize with Langevin, then switch the thermostat OFF
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq)
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

    cfg = EngineConfig(dt=2.0, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=12)
    eng = TiledEngine(ts, cfg)
    chunk = 2500
    run = jax.jit(eng.make_run(chunk))
    hs, ts_ps = [], []
    done = 0
    overflow_any = False
    while done < n_steps:
        tst, ov, obs = run(tst)
        overflow_any = overflow_any or bool(ov)
        done += chunk
        hs.append(float(np.mean(np.asarray(obs.h_conserved[-500:],
                                           np.float64))))
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
        "drift_kcalmol_per_ns": drift_per_ns,
        "drift_kT_per_atom_per_ns": drift_per_ns / kT / n_atoms,
        "overflow": overflow_any,
        "H_first": hs[0], "H_last": hs[-1],
    }
    with open("examples/results/nve_drift_v5e.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
