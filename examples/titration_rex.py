"""Titration curve via pH replica exchange (BASELINE config 5).

Replica exchange is how production constant-pH MD defeats the λ barrier-
crossing problem demonstrated in validate_titration.py: replicas at extreme
pH are tilted hard enough to transition, and swaps shuttle configurations
through the pH ladder. Samples are binned by each replica's CURRENT pH.

    python examples/titration_rex.py [--replicas 8] [--swaps 60]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--swaps", type=int, default=60)
    ap.add_argument("--steps-per-swap", type=int, default=2500)
    ap.add_argument("--dq-scale", type=float, default=0.15)
    ap.add_argument("--slope", type=float, default=12.0)
    ap.add_argument("--pk", type=float, default=4.25)
    ap.add_argument("--cal-steps", type=int, default=50_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from constant_ph_tpu import titration
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.observables import hh_curve
    from constant_ph_tpu.parallel.replica import (
        make_rex_runner_tiled, stack_replicas)
    from constant_ph_tpu.systems.water import solvated_acid
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import split_system, to_tiled

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=6, rigid_water=True, lambda_coupled=args.dq_scale,
            pK=args.pk, cutoff=8.0, coul_style="dsf", alpha=0.2, seed=1)
        ts = split_system(sys_)
        tst0 = to_tiled(ts, sys_.state)
    tst0 = jax.device_put(tst0, jax.devices()[0])

    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.005,
                       lambda_thermostat="langevin", lambda_gamma=0.05,
                       rebuild_every=20)
    bias = BiasParams(switch_slope=args.slope)
    eng = TiledEngine(ts, cfg, bias=bias)
    tst0, e = jax.jit(eng.make_minimize(400))(tst0)
    tst0, _, _ = eng.run(tst0, 2000)
    print(f"# equilibrated, E={float(e[-1]):.0f}", file=sys.stderr)

    dG = titration.calibrate_dG_ref_tiled(
        ts, tst0, cfg, bias=bias, equil_steps=args.cal_steps // 10,
        sample_steps=args.cal_steps)
    print(f"# dG_ref = {dG:.3f}", file=sys.stderr)
    ts.spec = titration.apply_dG_ref(ts.spec, dG)
    eng = TiledEngine(ts, cfg, bias=bias)

    R = args.replicas
    pHs = args.pk + np.linspace(-1.75, 1.75, R)
    reps = []
    for r in range(R):
        reps.append(tst0.replace(
            pH=jnp.asarray(pHs[r], tst0.pH.dtype),
            lam=jnp.full_like(tst0.lam, 0.5),
            key=jax.random.PRNGKey(100 + r)))
    batch = stack_replicas(reps)
    block = jax.jit(make_rex_runner_tiled(eng, args.steps_per_swap))

    key = jax.random.PRNGKey(7)
    samples: dict = {float(p): [] for p in pHs}
    acc = 0.0
    burn = args.swaps // 4
    for s in range(args.swaps):
        batch, key, accepted, obs = block(batch, key, s % 2)
        acc += float(jnp.mean(accepted))
        if s >= burn:
            ph_now = np.asarray(batch.pH)
            lam_now = np.asarray(obs.lam)[:, 0]
            for r in range(R):
                samples[float(round(ph_now[r], 4))].append(
                    float(lam_now[r] > 0.5))
        if s % 10 == 0:
            print(f"# swap {s}: acc so far {acc/(s+1):.2f}", file=sys.stderr)

    curve = []
    for p in sorted(samples):
        vals = samples[p]
        curve.append({
            "pH": p,
            "deprotonated": float(np.mean(vals)) if vals else None,
            "n_samples": len(vals),
            "hh": float(hh_curve(args.pk, p)),
        })
    print(json.dumps({"dG_ref": dG, "swap_acceptance": acc / args.swaps,
                      "curve": curve}))


if __name__ == "__main__":
    main()
