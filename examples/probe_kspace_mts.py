"""Probe: k-space impulse MTS (cfg.kspace_every) on the PME config.

For k in {1,2,3,4}: ms/step + NVE conserved-quantity drift (kT/atom/ns)
of the 24k-atom rigid-SPC/E λ-coupled system with smooth PME. The
reciprocal term is the RESPA outer level (LAMMPS run_style respa puts
kspace there); the impulse scheme is Verlet-I, so the conserved quantity
is only defined at MTS boundaries — sample obs rows [k-1::k].

Decision input for whether kspace_every enters the headline bench.
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
from constant_ph_tpu.ops.pme import make_pme_params
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=20, rigid_water=True, lambda_coupled=True,
            cutoff=8.0, skin=0.8, coul_style="cut", alpha=0.30, pH=5.0,
            hmr=3.0,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)
    n_atoms = sys_.state.x.shape[0]
    pp = make_pme_params(np.asarray(sys_.state.box), ts.params.grid, 0.30,
                         spacing=1.5, p=6, skin=0.8)
    log(f"{n_atoms} atoms, grid {ts.params.grid}, PME mesh {pp.mesh}")

    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq, kspace_ep=pp)
    tst, _ = jax.jit(eng_eq.make_minimize(400))(tst)
    run_eq = jax.jit(eng_eq.make_run(400))
    for _ in range(4):
        tst, ov, obs = run_eq(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                               jax.device_get(tst)), occ)
    tst0 = jax.device_put(tst, dev)
    log(f"equilibrated T={float(obs.temp[-1]):.0f}K, W={ts.params.W}")

    kT = units.BOLTZ * 300.0
    results = {}
    for k in (1, 2, 3, 4):
        cfg = EngineConfig(dt=2.0, thermostat="nve", lambda_thermostat="none",
                           rebuild_every=12, kspace_every=k,
                           lambda_frozen=True)
        eng = TiledEngine(ts, cfg, kspace_ep=pp)
        chunk = 1500
        run = jax.jit(eng.make_run(chunk))
        tst = tst0
        # warm + timing
        tst, ov, obs = run(tst)
        jax.block_until_ready(obs.temp)
        t0 = time.perf_counter()
        tst, ov, obs = run(tst)
        jax.block_until_ready(obs.temp)
        ms = (time.perf_counter() - t0) / chunk * 1e3
        # drift: restart from tst0 state, NVE, H at MTS boundaries
        tst = tst0
        hs, ts_ps = [], []
        done = 0
        overflow_any = bool(ov)
        while done < n_steps:
            tst, ov, obs = run(tst)
            overflow_any = overflow_any or bool(ov)
            done += chunk
            h = np.asarray(obs.h_conserved, np.float64)[k - 1::k]
            hs.append(float(np.mean(h[-(400 // k):])))
            ts_ps.append(done * cfg.dt / 1000.0)
        coef = np.polyfit(np.asarray(ts_ps), np.asarray(hs), 1)
        drift = coef[0] * 1000.0 / kT / n_atoms     # kT/atom/ns
        nsday = cfg.dt * 86.4 / ms
        results[k] = {"ms_per_step": ms, "ns_day": nsday,
                      "drift_kT_atom_ns": drift,
                      "overflow": overflow_any}
        log(f"k={k}: {ms:.3f} ms/step {nsday:.1f} ns/day "
            f"drift {drift:.2e} kT/atom/ns overflow={overflow_any}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
