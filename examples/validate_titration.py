"""Full physics validation: calibrated titration vs Henderson–Hasselbalch.

BASELINE config-1 acceptance (SURVEY.md §4 tier 4): a model titratable acid
in SPC/E water, ΔG_ref calibrated by thermodynamic integration, then a pH
sweep via λ-dynamics; the time-averaged deprotonated fraction should track
1/(1+10^(pK−pH)).

Long-running (minutes on TPU, tens of minutes on CPU) — not part of CI.

    python examples/validate_titration.py [--nside 6] [--steps 200000]
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
    ap.add_argument("--nside", type=int, default=6)
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--cal-steps", type=int, default=20_000)
    ap.add_argument("--dq-scale", type=float, default=1.0,
                    help="site charge-coupling strength (1 = full)")
    ap.add_argument("--slope", type=float, default=12.0,
                    help="switching-function slope; the Donnini 50 makes\n                    the dG_ref step a kinetic trap at strong coupling")
    ap.add_argument("--ph", default="2.75,3.5,4.25,5.0,5.75")
    ap.add_argument("--pk", type=float, default=4.25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from constant_ph_tpu import titration
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.observables import hh_curve, protonation_fraction
    from constant_ph_tpu.systems.water import solvated_acid
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import split_system, to_tiled

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        sys_ = solvated_acid(
            n_side=args.nside, rigid_water=True,
            lambda_coupled=args.dq_scale,
            pK=args.pk, cutoff=8.0, coul_style="dsf", alpha=0.2, seed=1,
        )
        ts = split_system(sys_)
        tst0 = to_tiled(ts, sys_.state)
    tst0 = jax.device_put(tst0, jax.devices()[0])

    cfg = EngineConfig(
        dt=1.0, thermostat="langevin", T=300.0, gamma=0.005,
        lambda_thermostat="langevin", lambda_gamma=0.05, rebuild_every=20,
    )
    bias = BiasParams(switch_slope=args.slope)
    eng0 = TiledEngine(ts, cfg, bias=bias)
    tst0, e = jax.jit(eng0.make_minimize(400))(tst0)
    print(f"# minimized E={float(e[-1]):.1f}", file=sys.stderr)
    tst0, _, _ = eng0.run(tst0, 2000)   # thermal equilibration
    print("# equilibrated", file=sys.stderr)

    dG, (nodes, prof) = titration.calibrate_dG_ref_tiled(
        ts, tst0, cfg, bias=bias, equil_steps=args.cal_steps // 10,
        sample_steps=args.cal_steps, return_profile=True)
    print(f"# dG_ref = {dG:.3f} kcal/mol; profile "
          f"{np.round(prof, 2).tolist()}", file=sys.stderr)

    ts_cal = ts
    ts_cal.spec = titration.apply_dG_ref(ts.spec, dG)
    eng = TiledEngine(ts_cal, cfg, bias=bias)

    # chunk device calls: a single multi-minute call can trip the remote
    # runtime's watchdog. Two walkers per pH (protonated/deprotonated
    # starts) bracket the equilibrium: matching walkers = converged,
    # disagreeing walkers expose hysteresis honestly.
    chunk = 25_000
    run_chunk = jax.jit(eng.make_run(chunk))
    results = []
    for ph in [float(p) for p in args.ph.split(",")]:
        fr = {}
        for tag, lam0 in (("up", 0.05), ("down", 0.95)):
            st = tst0.replace(pH=jnp.asarray(ph, tst0.pH.dtype),
                              lam=jnp.full_like(tst0.lam, lam0))
            lams = []
            ov = False
            for _ in range(max(1, args.steps // chunk)):
                st, ov_i, obs = run_chunk(st)
                ov = ov or bool(ov_i)
                lams.append(np.asarray(obs.lam))
            lam = np.concatenate(lams)
            fr[tag] = float(protonation_fraction(lam)[0])
        results.append({"pH": ph, "deprotonated_up": fr["up"],
                        "deprotonated_down": fr["down"],
                        "hh": float(hh_curve(args.pk, ph))})
        print(f"# pH {ph}: deprot up {fr['up']:.3f} / down {fr['down']:.3f}"
              f" (HH {results[-1]['hh']:.3f})", file=sys.stderr)
    print(json.dumps({"dG_ref": dG, "curve": results}))


if __name__ == "__main__":
    main()
