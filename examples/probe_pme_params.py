"""PME parameter sweep for BASELINE config 3: mesh spacing / α vs speed,
with accuracy measured against the factorized-Ewald oracle (ops/ewald.py,
same α) on the live system.

Reports ms/step of the full constant-pH step and the reciprocal-space
force RMS error. Standard PME practice accepts relative force RMS error
~1e-4..1e-3; LAMMPS's default pppm accuracy is 1e-4 of the reference
two-atom force.
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
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]
    dt = 2.0

    with jax.default_device(cpu):
        sys_ = solvated_polypeptide(
            n_residues=40, sites_every=2, box_len=66.0, water_spacing=3.1,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=5.0,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    log(f"{sys_.state.x.shape[0]} atoms, grid {ts.params.grid}")
    tst = jax.device_put(tst, dev)

    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng = TiledEngine(ts, cfg_eq)
    tst, _ = jax.jit(eng.make_minimize(400))(tst)
    run = jax.jit(eng.make_run(200))
    for _ in range(3):
        tst, ov, obs = run(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(
            ts, jax.tree.map(jnp.asarray, jax.device_get(tst)), occ)
    tst = jax.device_put(tst, dev)
    log(f"retiled to W={ts.params.W}")

    cfg = EngineConfig(dt=dt, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", rebuild_every=8)
    box = np.asarray(sys_.state.box)

    def measure(eng_k, tst, n_blocks=30):
        block = eng_k.cfg.rebuild_every
        run_block = jax.jit(eng_k.make_run(block))
        tst2, ov, obs = run_block(tst)
        tst2, ov, obs = run_block(tst2)
        float(obs.temp[-1])
        t0 = time.perf_counter()
        t = tst2
        for _ in range(n_blocks):
            t, ov, obs = run_block(t)
        ok = bool(jnp.isfinite(obs.h_conserved).all())
        wall = time.perf_counter() - t0
        return wall / (n_blocks * block) * 1e3, ok

    # force-accuracy oracle: factorized Ewald at the same alpha
    def force_err(eng_k, eng_ref, tst):
        f1 = jax.jit(lambda s: eng_k.compute_forces(s).fw)(tst)
        f0 = jax.jit(lambda s: eng_ref.compute_forces(s).fw)(tst)
        d = np.asarray(f1 - f0, np.float64)
        r = np.asarray(f0, np.float64)
        return float(np.sqrt((d ** 2).mean()) / np.sqrt((r ** 2).mean()))

    for alpha, spacing, p in [(0.35, 1.0, 6), (0.35, 1.2, 6),
                              (0.35, 1.35, 6), (0.30, 1.35, 6),
                              (0.35, 1.35, 4), (0.30, 1.5, 6)]:
        ep = make_ewald_params(box, alpha, accuracy=1e-5)
        eng_ref = TiledEngine(ts, cfg, kspace_ep=ep)
        pp = make_pme_params(box, ts.params.grid, alpha, spacing=spacing,
                             p=p)
        eng_k = TiledEngine(ts, cfg, kspace_ep=pp)
        err = force_err(eng_k, eng_ref, tst)
        ms, ok = measure(eng_k, tst)
        nsday = dt * 86.4 / ms
        print(f"alpha={alpha} spacing={spacing} p={p} mesh={pp.mesh}: "
              f"{ms:.2f} ms/step  {nsday:.1f} ns/day  "
              f"frel={err:.2e} finite={ok}", flush=True)


if __name__ == "__main__":
    main()
