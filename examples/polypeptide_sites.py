"""Multi-site λ statistics at HEWL scale (BASELINE config 4 user surface):
run the 27k-atom, 20-site solvated polypeptide at a given pH and report
per-site time-averaged λ, deprotonated fraction, and the per-site HH
expectation from each site's pK. Sites here cycle pK ∈ {4.25, 3.65, 6.5}
(ASP/GLU/HIS-like), so one pH separates the site classes.

    python examples/polypeptide_sites.py [pH] [steps]
"""
from __future__ import annotations

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.systems.protein import solvated_polypeptide
from constant_ph_tpu.tiled.elastic import elastic_run
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    pH = float(sys.argv[1]) if len(sys.argv) > 1 else 4.5
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_polypeptide(
            n_residues=40, sites_every=2, box_len=66.0, water_spacing=3.1,
            cutoff=8.0, skin=0.8, coul_style="dsf", alpha=0.2, pH=pH,
        )
        ts = split_system(sys_, skin=0.8, tile_safety=1.72)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)
    pks = np.asarray(sys_.spec.pK)
    log(f"{sys_.state.x.shape[0]} atoms, {len(pks)} sites, pH {pH}")

    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0, gamma=0.01,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng = TiledEngine(ts, cfg_eq)
    tst, _ = jax.jit(eng.make_minimize(400))(tst)
    run_eq = jax.jit(eng.make_run(400))
    for _ in range(3):
        tst, ov, obs = run_eq(tst)
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    with jax.default_device(cpu):
        ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                               jax.device_get(tst)), occ)
    tst = jax.device_put(tst, dev)
    log(f"equilibrated, W={ts.params.W}")

    # TI-calibrate the force-field reference deprotonation dG on ONE site
    # and apply to all: every site carries the same headgroup chemistry
    # (pK differs only as the experimental label in the pH driving term),
    # so dG_ref is shared — exactly the reference's single-site pK/pH
    # separation (fix_constant_pH.cpp:111)
    from constant_ph_tpu import titration

    cfg_cal = EngineConfig(dt=1.0, thermostat="langevin", T=300.0,
                           gamma=0.01, lambda_thermostat="langevin",
                           rebuild_every=12)
    dG = titration.calibrate_dG_ref_tiled(
        ts, tst, cfg_cal, site=0, equil_steps=500, sample_steps=3000)
    ts.spec = titration.apply_dG_ref(ts.spec, dG)
    log(f"TI-calibrated dG_ref = {dG:.3f} kcal/mol (applied to all sites)")

    # start each site in its HH-favored end state and test STABILITY of
    # that assignment over the run: spontaneous barrier crossings need
    # pH-REX timescales (see examples/titration_rex.py and the round-1
    # single-site study), but a mis-calibrated dG_ref or unbalanced
    # coupling would flip sites within tens of ps — this catches that.
    lam0 = np.where(pks > pH, 0.0, 1.0).astype(np.float32)
    tst = tst.replace(lam=jnp.asarray(lam0),
                      v_lam=jnp.zeros_like(tst.v_lam))
    log(f"initial per-site lambda set to HH-favored ends "
        f"({int((pks > pH).sum())} protonated)")

    cfg = EngineConfig(dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", lambda_gamma=0.05,
                       rebuild_every=12)
    ts, tst, obs, info = elastic_run(ts, tst, cfg, n_steps, chunk=4000,
                                     device=dev)
    lam = np.asarray(obs.lam, np.float64)        # (steps, S)
    burn = lam.shape[0] // 4
    lam_mean = lam[burn:].mean(axis=0)
    frac_deprot = (lam[burn:] > 0.5).mean(axis=0)
    hh = 1.0 / (1.0 + 10.0 ** (pks - pH))
    sites = [
        {"site": i, "pK": float(pks[i]), "lam_mean": float(lam_mean[i]),
         "frac_deprot": float(frac_deprot[i]), "hh": float(hh[i])}
        for i in range(len(pks))
    ]
    # class-level check: acidic sites (pK < pH) must stay deprotonated and
    # basic-like sites (pK > pH) must stay protonated over the run
    lo = np.mean([s["frac_deprot"] for s in sites if s["pK"] < pH])
    hi = np.mean([s["frac_deprot"] for s in sites if s["pK"] > pH])
    assert lo > 0.8 and hi < 0.2, (lo, hi)
    result = {
        "pH": pH, "steps": n_steps, "ps": n_steps * cfg.dt / 1000.0,
        "dG_ref": float(dG),
        "n_retiles": info.n_retiles,
        "n_dangerous_blocks": info.n_dangerous_blocks,
        "mean_frac_deprot_acidic_sites": float(lo),
        "mean_frac_deprot_basic_sites": float(hi),
        "sites": sites,
    }
    with open("examples/results/polypeptide_sites_v5e.json", "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
