"""Headline benchmark: ns/day of constant-pH MD on a ~24k-atom solvated
titratable system on one TPU chip (BASELINE.md north star).

Baseline context: the reference publishes NO numbers (2-file non-compiling
sketch; BASELINE.json "published": {}). The measurable yardstick adopted in
BASELINE.md is LAMMPS-CPU throughput on a comparable 25k-atom solvated
system, ~5 ns/day at 2 fs on a multicore CPU node (order-of-magnitude,
documented in BASELINE.md §table) — `vs_baseline` is ns/day ÷ 5.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_NS_DAY = 5.0


def main():
    import numpy as np

    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.minimize import fire_minimize
    from constant_ph_tpu.systems.water import solvated_acid

    n_side = 20           # 20^3-1 waters + acid = 24,001 atoms
    dt = 1.0
    sys_ = solvated_acid(
        n_side=n_side, rigid_water=True, lambda_coupled=True,
        cutoff=8.0, skin=2.0, coul_style="dsf", alpha=0.2, pH=5.0,
    )
    n_atoms = sys_.state.x.shape[0]
    cfg = EngineConfig(
        dt=dt, thermostat="langevin", T=300.0, gamma=0.002,
        lambda_thermostat="langevin", rebuild_every=20,
    )
    eng = sys_.make_engine(cfg)

    import sys as _sys

    def log(msg):
        print(f"# {msg}", file=_sys.stderr, flush=True)

    log(f"system built: {n_atoms} atoms")
    # jit EVERYTHING — on the remote TPU backend each eager primitive is a
    # separate remote compile, so eager neighbor builds take minutes.
    minimize = jax.jit(lambda s: fire_minimize(eng, s, n_steps=100)[0])
    state = minimize(sys_.state)
    jax.block_until_ready(state.x)
    log("minimized")
    nbr = jax.jit(eng.build_neighbors)(state.x, state.box)

    # ONE compiled block (rebuild + rebuild_every steps), reused for warmup
    # and measurement — keeps compile cost to a single program.
    block_steps = cfg.rebuild_every
    run_block = jax.jit(eng.make_run(block_steps))
    state, nbr, obs = run_block(state, nbr)
    jax.block_until_ready(state.x)
    log("compiled + warm block done")
    for _ in range(2):  # extra warmup
        state, nbr, obs = run_block(state, nbr)
    jax.block_until_ready(state.x)

    n_blocks = 10
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        state, nbr, obs = run_block(state, nbr)
    jax.block_until_ready(state.x)
    wall = time.perf_counter() - t0
    n_meas = n_blocks * block_steps
    log(f"measured {n_meas} steps in {wall:.3f}s "
        f"({1e3 * wall / n_meas:.2f} ms/step)")

    ns_per_day = (n_meas * dt / 1.0e6) / (wall / 86400.0)
    result = {
        "metric": f"constant-pH MD ns/day, {n_atoms}-atom solvated titratable "
                  f"acid (rigid SPC/E, DSF coulomb, dt={dt}fs)",
        "value": round(ns_per_day, 3),
        "unit": "ns/day",
        "vs_baseline": round(ns_per_day / BASELINE_NS_DAY, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
