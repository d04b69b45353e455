"""Measure the λ-PMF barrier vs buffer-water count (full Δq).

Why: round-3 metadynamics at full Δq piled 16 kcal/mol of well-tempered
bias at λ≈0.42 without one barrier crossing — the λ-PMF mid-barrier is
Marcus solvent reorganization, which scales as Σ_i dq_i². With the
compensating +1e on a SINGLE buffer water (systems/protein.py round-2
layout) the buffer side alone contributes ~1/3 e² per atom concentrated
in one molecule; spreading over N scattered waters cuts that term ~N×.
This probe measures the actual PMF profile F(λ) = ∫⟨dU/dλ⟩dλ on a small
full-Δq system for n_buffer_waters ∈ {1, 4, 16} and reports the barrier
height above the end-state baseline — the number that decides whether
λ-dynamics titration is samplable (≲6 kcal ⇒ flips on 10-ps scales).

TI machinery: titration.calibrate_dG_ref_tiled(return_profile=True) with
a uniform λ grid (trapezoid), frozen-λ windows (the same estimator used
for dG_ref calibration, tested in tests/test_calibration.py).

Run (one v5e, ~10 min): PYTHONPATH=. python examples/probe_buffer_barrier.py
CPU smoke:             ... --small --cpu
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    small = "--small" in sys.argv
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from constant_ph_tpu import titration
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.systems.protein import solvated_polypeptide
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled

    t0 = time.time()
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    nodes = np.linspace(0.0, 1.0, 9 if small else 17)
    # trapezoid weights on the uniform grid (we want the PROFILE; the
    # Gauss-Legendre default is for the integral only)
    w = np.full(nodes.shape, nodes[1] - nodes[0])
    w[0] *= 0.5
    w[-1] *= 0.5

    out = {"nodes": nodes.tolist(), "rows": []}
    for n_buf in ([1, 4] if small else [1, 4, 16]):
        build = dict(n_residues=8, sites_every=4, box_len=30.0,
                     water_spacing=3.15, cutoff=8.0, skin=0.8,
                     coul_style="dsf", alpha=0.2, pH=4.25, dq_scale=1.0,
                     n_buffer_waters=n_buf)
        if small:
            build.update(box_len=24.0, water_spacing=3.5, cutoff=6.0,
                         skin=1.2)
        with jax.default_device(cpu):
            sys_ = solvated_polypeptide(**build)
            ts = split_system(sys_, skin=build["skin"], tile_safety=1.72)
            tst = to_tiled(ts, sys_.state)
        tst = jax.device_put(tst, dev)
        cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0,
                              gamma=0.01, lambda_thermostat="langevin",
                              rebuild_every=8, force_cap=50.0)
        eng = TiledEngine(ts, cfg_eq)
        tst, _ = jax.jit(eng.make_minimize(300))(tst)
        run_eq = jax.jit(eng.make_run(200))
        for _ in range(2 if small else 4):
            tst, ov, obs = run_eq(tst)
        occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
        with jax.default_device(cpu):
            ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                                   jax.device_get(tst)), occ,
                                  margin_min=6)
        tst = jax.device_put(tst, dev)
        log(f"n_buf={n_buf}: {sys_.state.x.shape[0]} atoms equilibrated "
            f"({time.time()-t0:.0f}s)")

        cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0,
                           gamma=0.01, lambda_thermostat="langevin",
                           rebuild_every=12)
        dG, (xs, means) = titration.calibrate_dG_ref_tiled(
            ts, tst, cfg, bias=BiasParams(), site=0,
            equil_steps=100 if small else 400,
            sample_steps=200 if small else 1600,
            nodes=nodes, weights=w, return_profile=True)
        # F(λ) by cumulative trapezoid; barrier = max F above the chord
        # (the chord is the pH/calibration-removable tilt)
        F = np.concatenate(
            [[0.0], np.cumsum((means[1:] + means[:-1]) / 2 * np.diff(xs))])
        chord = F[0] + (F[-1] - F[0]) * (xs - xs[0]) / (xs[-1] - xs[0])
        barrier = float(np.max(F - chord))
        row = {"n_buffer_waters": n_buf, "dG_TI": dG,
               "dUdlam": list(map(float, means)),
               "F": F.tolist(), "barrier_above_chord": barrier}
        out["rows"].append(row)
        log(f"n_buf={n_buf}: dG_TI={dG:.2f} kcal/mol, "
            f"barrier(above chord)={barrier:.2f} kcal/mol "
            f"({time.time()-t0:.0f}s)")

    path = "examples/results/buffer_barrier_probe.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps([(r["n_buffer_waters"], round(r["barrier_above_chord"], 2))
                      for r in out["rows"]]))


if __name__ == "__main__":
    main()
