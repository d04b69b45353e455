"""Command-line driver (SURVEY.md layer D — the input-script analog).

The reference's user API is one LAMMPS line:
    fix <ID> <group> constant_pH <nevery> <groupH> <groupW> <pK> <pH> <T>
(fix_constant_pH.cpp:36-54). Ours is a config file + CLI:

    python -m constant_ph_tpu run sim.yaml          # or .json
    python -m constant_ph_tpu titrate sim.yaml --ph 2,3,4,5,6,7

Config keys (all optional beyond `system`):
  system:   {builder: solvated_acid|water_box|solvated_polypeptide|lj_fluid,
             <builder kwargs — incl. nevery-style lambda args, pK, pH, T>}
  engine:   {dt, thermostat, T, gamma, tau, lambda_nevery,
             lambda_thermostat, lambda_gamma, rebuild_every, force_cap,
             kspace_every, kspace_live_box}
  bias:     {w, s, k, a, b, r, m, d, switch_slope}  (Donnini–Ullmann defaults)
  kspace:   {style: ewald|pme, alpha, accuracy, spacing, p}
            (factorized Ewald, or smooth PME on the tiled path —
             spacing/p defaults per examples/probe_pme_params.py)
  metad:    {nbins, sigma, h0, gamma, stride}   (λ-metadynamics for
            `titrate --method metad` / `calibrate --method metad`)
  dg_ref:   scalar kcal/mol, or {base: scalar, class_offsets:
            {"<pK>": offset, ...}} — install a calibrated (optionally
            per-pK-class) ΔG_ref on every λ site at build time
  run:      {steps, minimize_steps, equilibrate_steps, tiled: bool,
             checkpoint: path, restart: path, observe_every,
             output: path.jsonl|path.csv,
             trajectory: path.dcd, traj_every: N,   (tiled path)
             pressure: atm, barostat_dlnv            (NpT; with kspace
             requires style pme + engine.kspace_live_box: true)}
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _load_config(path):
    text = open(path).read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml
            return yaml.safe_load(text)
        except ImportError:
            raise SystemExit("pyyaml not available — use a .json config")
    return json.loads(text)


_BUILDERS = {
    "solvated_acid": "constant_ph_tpu.systems.water:solvated_acid",
    "water_box": "constant_ph_tpu.systems.water:water_box",
    "solvated_polypeptide": "constant_ph_tpu.systems.protein:solvated_polypeptide",
    "lj_fluid": "constant_ph_tpu.systems.lj:lj_fluid",
    # LAMMPS data file + λ-site JSON sidecar (the reference's input world)
    "lammps_data": "constant_ph_tpu.systems.lammps_data:system_from_deck",
}


def _build_system(spec: dict):
    import importlib

    name = spec.pop("builder")
    mod, fn = _BUILDERS[name].split(":")
    builder = getattr(importlib.import_module(mod), fn)
    return builder(**spec)


def _apply_dg_ref(cfg: dict, system):
    """Install a config-supplied ΔG_ref on the system's LambdaSpec.

    Config key `dg_ref` is either a scalar (shared constant, kcal/mol)
    or {base: scalar, class_offsets: {"<pK>": offset, ...}} — per-pK-
    class constants (the per-site pK granularity of the reference fix's
    argument list, fix_constant_pH.cpp:47). Applied at build time so
    every command (run/titrate/calibrate) sees the same landscape."""
    if "dg_ref" not in cfg:
        return system
    from constant_ph_tpu import titration

    val = cfg["dg_ref"]
    if isinstance(val, dict):
        offs = {float(k): float(v)
                for k, v in (val.get("class_offsets") or {}).items()}
        system.spec = titration.apply_dG_ref_per_class(
            system.spec, float(val["base"]), offs)
    else:
        system.spec = titration.apply_dG_ref(system.spec, float(val))
    return system


def _make_engines(cfg: dict, system):
    import numpy as np

    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.lambda_dyn import BiasParams

    ecfg = EngineConfig(**cfg.get("engine", {}))
    bias = BiasParams(**cfg.get("bias", {}))
    kspace_ep = None
    if "kspace" in cfg:
        ks = cfg["kspace"]
        if ks.get("style", "ewald") == "pme":
            # PME spreads on a mesh aligned to the TILE grid, which exists
            # only after split_system — defer construction (see
            # _resolve_kspace) to the tiled path
            kspace_ep = ("pme", dict(ks))
        else:
            from constant_ph_tpu.ops.ewald import make_ewald_params

            kspace_ep = make_ewald_params(
                np.asarray(system.state.box), ks["alpha"],
                accuracy=ks.get("accuracy", 1e-4),
            )
    return ecfg, bias, kspace_ep


def _resolve_kspace(kspace_ep, box, ts):
    """Materialize a deferred ("pme", spec) kspace into PMEParams now that
    the tile grid is known. Defaults match examples/probe_pme_params.py's
    tuned accuracy/speed point."""
    import numpy as np

    if not (isinstance(kspace_ep, tuple) and kspace_ep
            and kspace_ep[0] == "pme"):
        return kspace_ep
    from constant_ph_tpu.ops.pme import make_pme_params

    ks = kspace_ep[1]
    return make_pme_params(
        np.asarray(box), ts.params.grid, ks["alpha"],
        spacing=ks.get("spacing", 1.5), p=ks.get("p", 6),
        skin=ts.params.skin,
    )


def cmd_run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = _load_config(args.config)
    run_cfg = cfg.get("run", {})
    tiled = run_cfg.get("tiled", True)
    t0 = time.time()

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        system = _apply_dg_ref(cfg, _build_system(dict(cfg["system"])))
        ecfg, bias, kspace_ep = _make_engines(cfg, system)
        state = system.state
        if run_cfg.get("restart"):
            from constant_ph_tpu import checkpoint

            state = checkpoint.load(run_cfg["restart"])
            print(f"# restarted from {run_cfg['restart']} at step "
                  f"{int(state.step)}", file=sys.stderr)

    n_steps = int(run_cfg.get("steps", 1000))
    observe_every = int(run_cfg.get("observe_every", 10))

    if tiled and system.constraints is not None:
        from constant_ph_tpu.tiled.engine import TiledEngine
        from constant_ph_tpu.tiled.layout import (
            split_system, to_canonical, to_tiled,
        )

        with jax.default_device(cpu):
            ts = split_system(system)
            tst = to_tiled(ts, state)
        tst = jax.device_put(tst, jax.devices()[0])
        kspace_ep = _resolve_kspace(kspace_ep, system.state.box, ts)
        eng = TiledEngine(ts, ecfg, bias=bias, kspace_ep=kspace_ep)
        if run_cfg.get("minimize_steps", 200):
            tst, e = jax.jit(
                eng.make_minimize(int(run_cfg.get("minimize_steps", 200)))
            )(tst)
            print(f"# minimized to E={float(e[-1]):.1f}", file=sys.stderr)
        # optional equilibrate + cost-aware retile: pair work scales with
        # the padded tile capacity, so production runs first measure the
        # equilibrated occupancy and tighten W (layout.retile_auto)
        eq_steps = int(run_cfg.get("equilibrate_steps", 0))
        if eq_steps:
            from constant_ph_tpu.tiled.layout import retile_auto

            tst, _, _ = eng.run(tst, eq_steps)
            occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
            with jax.default_device(cpu):
                ts, tst = retile_auto(
                    ts, jax.tree.map(jnp.asarray, jax.device_get(tst)), occ)
            tst = jax.device_put(tst, jax.devices()[0])
            print(f"# equilibrated {eq_steps} steps, retiled occ {occ} -> "
                  f"W {ts.params.W}", file=sys.stderr)

        # elastic production run (tiled/elastic.py): jitted chunks, grow
        # capacity on the early overflow flag, count dangerous builds
        from constant_ph_tpu.tiled.elastic import elastic_run

        traj = run_cfg.get("trajectory")
        every = int(run_cfg.get("traj_every", max(observe_every, 100)))
        if traj and every % ecfg.rebuild_every:
            every = -(-every // ecfg.rebuild_every) * ecfg.rebuild_every
            print(f"# traj_every rounded up to {every} (must be a multiple "
                  f"of rebuild_every={ecfg.rebuild_every})", file=sys.stderr)
        chunk = every if traj else min(n_steps, 2000)
        dw = None
        if traj:
            from constant_ph_tpu.trajectory import DCDWriter

            dw = DCDWriter(traj, int(system.state.x.shape[0]),
                           dt_fs=ecfg.dt)

        def on_chunk(done, ts_c, tst_c, obs_c):
            if dw is not None:
                dw.write_frame(np.asarray(to_canonical(ts_c, tst_c).x),
                               np.asarray(system.state.box))

        pressure = run_cfg.get("pressure")
        if pressure is not None:
            # NpT: MC barostat between chunks (tiled/npt.py). Composes
            # with kspace only as PME + engine.kspace_live_box (the
            # influence function tracks the state box); baked-box Ewald
            # params would go stale after volume moves — refuse early
            # with a config-level hint (tiled/npt._check_npt_kspace is
            # the authoritative guard).
            if kspace_ep is not None and not ecfg.kspace_live_box:
                raise ValueError(
                    "run.pressure (NPT) with a kspace style needs "
                    '{"kspace": {"style": "pme", ...}, "engine": '
                    '{"kspace_live_box": true}} — baked-box reciprocal '
                    "params would be evaluated stale after volume moves")
            from constant_ph_tpu.tiled.npt import npt_elastic_run

            ts, tst, obs, info, npt_stats = npt_elastic_run(
                ts, tst, ecfg, n_steps, pressure_atm=float(pressure),
                chunk=chunk, bias=bias, kspace_ep=kspace_ep,
                max_dlnV=float(run_cfg.get("barostat_dlnv", 2e-3)),
                on_chunk=on_chunk)
            vol = npt_stats["volume"]
            print(f"# NPT: {npt_stats['accepted']}/"
                  f"{npt_stats['proposed']} volume moves accepted, "
                  f"V {vol[0]:.0f} -> {vol[-1]:.0f} A^3", file=sys.stderr)
        else:
            ts, tst, obs, info = elastic_run(
                ts, tst, ecfg, n_steps, chunk=chunk, bias=bias,
                kspace_ep=kspace_ep, on_chunk=on_chunk)
        if dw is not None:
            dw.close()
            print(f"# trajectory -> {traj}", file=sys.stderr)
        state = to_canonical(ts, tst)
        if info.n_retiles:
            print(f"# retiled {info.n_retiles}x (final W {info.final_W})",
                  file=sys.stderr)
        if info.n_dangerous_blocks:
            print(f"# WARNING: {info.n_dangerous_blocks} dangerous-build "
                  f"blocks (water drift past skin between rebins)",
                  file=sys.stderr)
    else:
        from constant_ph_tpu.minimize import fire_minimize

        if isinstance(kspace_ep, tuple) and kspace_ep and kspace_ep[0] == "pme":
            raise SystemExit(
                "kspace style 'pme' requires the tiled engine "
                "(run.tiled: true + rigid water); use style 'ewald' here")
        eng = system.make_engine(ecfg, bias=bias)
        if run_cfg.get("minimize_steps", 200):
            state, _ = fire_minimize(
                eng, state, n_steps=int(run_cfg.get("minimize_steps", 200)))
        state, nbr, obs = eng.run(state, n_steps)

    if run_cfg.get("checkpoint"):
        from constant_ph_tpu import checkpoint

        checkpoint.save(run_cfg["checkpoint"], state)
        print(f"# checkpoint -> {run_cfg['checkpoint']}", file=sys.stderr)

    from constant_ph_tpu import observables as obsmod

    out = run_cfg.get("output")
    if out:
        with open(out, "w") as fh:
            if out.endswith(".csv"):
                obsmod.write_csv(obs, fh, every=observe_every)
            else:
                obsmod.write_jsonl(obs, fh, every=observe_every)
        print(f"# observables -> {out}", file=sys.stderr)

    lam = np.asarray(obs.lam)
    summary = {
        "steps": n_steps,
        "wall_s": round(time.time() - t0, 2),
        "e_pot": float(np.asarray(obs.e_pot)[-1]),
        "temp": float(np.asarray(obs.temp)[-100:].mean()),
    }
    if lam.size:
        summary["protonation_fraction"] = (
            obsmod.protonation_fraction(lam).tolist())
        summary["lambda_final"] = lam[-1].tolist()
    print(json.dumps(summary))


def cmd_titrate(args):
    """pH sweep: replica exchange (default) or λ-metadynamics walkers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if getattr(args, "method", "rex") == "metad":
        return _titrate_metad(args)

    cfg = _load_config(args.config)
    pHs = [float(p) for p in args.ph.split(",")]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        system = _apply_dg_ref(cfg, _build_system(dict(cfg["system"])))
        ecfg, bias, _ = _make_engines(cfg, system)

    from constant_ph_tpu.observables import hh_curve
    from constant_ph_tpu.parallel.replica import (
        make_rex_runner, stack_replicas,
    )

    eng = system.make_engine(ecfg, bias=bias)
    states = []
    for i, ph in enumerate(pHs):
        states.append(system.state.replace(
            pH=jnp.asarray(ph, system.state.pH.dtype),
            key=jax.random.PRNGKey(i),
        ))
    batched = stack_replicas(states)
    nbr = eng.build_neighbors(system.state.x, system.state.box)
    nbrs = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (len(pHs),) + a.shape), nbr)

    steps_per_swap = int(cfg.get("run", {}).get("steps_per_swap", 100))
    n_swaps = int(cfg.get("run", {}).get("n_swaps", 20))
    block = jax.jit(make_rex_runner(eng, steps_per_swap))
    key = jax.random.PRNGKey(0)
    frac = np.zeros((len(pHs),))
    acc = 0.0
    for s in range(n_swaps):
        batched, nbrs, key, accepted, obs = block(batched, nbrs, key, s % 2)
        frac += np.asarray(jnp.mean((obs.lam > 0.5).astype(jnp.float32),
                                    axis=-1))
        acc += float(jnp.mean(accepted))
    frac /= n_swaps
    out = {
        "pH": pHs,
        "deprotonated_fraction": frac.tolist(),
        "hh_reference": hh_curve(
            float(np.asarray(system.spec.pK)[0]), np.asarray(pHs)).tolist(),
        "swap_acceptance": acc / n_swaps,
    }
    print(json.dumps(out))


def _titrate_metad(args):
    """One well-tempered λ-metadynamics walker per pH (vmapped), full-Δq
    capable: the converged bias profile yields per-site deprotonated
    fractions without barrier-crossing statistics (metad.py; the heavy
    production driver is examples/titration_metad_multisite.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = _load_config(args.config)
    pHs = [float(p) for p in args.ph.split(",")]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        system = _apply_dg_ref(cfg, _build_system(dict(cfg["system"])))
        ecfg, bias, kspace_ep = _make_engines(cfg, system)

    from constant_ph_tpu import metad
    from constant_ph_tpu.observables import hh_curve
    from constant_ph_tpu.parallel.replica import stack_replicas
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import split_system, to_tiled

    with jax.default_device(cpu):
        ts = split_system(system)
        tst = to_tiled(ts, system.state)
    tst = jax.device_put(tst, jax.devices()[0])
    kspace_ep = _resolve_kspace(kspace_ep, system.state.box, ts)
    mp = metad.MetadParams(
        stride=max(1, int(round(50.0 / ecfg.dt))),
        **cfg.get("metad", {}))
    eng = TiledEngine(ts, ecfg, bias=bias, kspace_ep=kspace_ep, metad=mp)
    S = ts.spec.n_sites
    V0, dV0 = metad.init_tables(S, mp)
    # install (zero) tables BEFORE the first force evaluation — the metad
    # engine requires the state to carry matching-shape tables
    tst = tst.replace(metad_v=V0, metad_dv=dV0)
    tst, _ = jax.jit(eng.make_minimize(
        int(cfg.get("run", {}).get("minimize_steps", 200))))(tst)
    reps = [tst.replace(pH=jnp.asarray(p, tst.pH.dtype),
                        metad_v=V0, metad_dv=dV0,
                        key=jax.random.PRNGKey(100 + i))
            for i, p in enumerate(pHs)]
    batch = stack_replicas(reps)

    n_steps = int(cfg.get("run", {}).get("steps", 20_000))
    chunk = 50 * ecfg.rebuild_every
    n_chunks = max(1, n_steps // chunk)
    runv = jax.jit(jax.vmap(eng.make_run(chunk)))
    frac_sum = np.zeros((len(pHs), S))
    n_tail = 0
    for c in range(n_chunks):
        batch, ov, _ = runv(batch)
        if c >= n_chunks // 2:              # tail-time-averaged estimator
            fr = metad.deprotonated_fraction(
                batch.metad_v.reshape(len(pHs) * S, mp.nbins), mp)
            frac_sum += np.asarray(fr).reshape(len(pHs), S)
            n_tail += 1
    frac = frac_sum / max(n_tail, 1)
    out = {
        "method": "metad",
        "pH": pHs,
        "deprotonated_fraction": frac[:, 0].tolist(),
        "per_site": frac.tolist(),
        "hh_reference": hh_curve(
            float(np.asarray(system.spec.pK)[0]), np.asarray(pHs)).tolist(),
        "steps": n_chunks * chunk,
    }
    print(json.dumps(out))


def cmd_calibrate(args):
    """ΔG_ref calibration: TI over frozen-λ windows for site 0 (default),
    or per-site λ-metadynamics (--method metad)."""
    import jax

    cfg = _load_config(args.config)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        system = _apply_dg_ref(cfg, _build_system(dict(cfg["system"])))
        ecfg, bias, kspace_ep = _make_engines(cfg, system)

    from constant_ph_tpu import titration
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import split_system, to_tiled

    with jax.default_device(cpu):
        ts = split_system(system)
        tst = to_tiled(ts, system.state)
    tst = jax.device_put(tst, jax.devices()[0])
    kspace_ep = _resolve_kspace(kspace_ep, system.state.box, ts)
    eng = TiledEngine(ts, ecfg, bias=bias, kspace_ep=kspace_ep)
    tst, _ = jax.jit(eng.make_minimize(300))(tst)
    tst, _, _ = eng.run(tst, int(args.equil))
    if getattr(args, "method", "ti") == "metad":
        mp = None
        if "metad" in cfg:
            from constant_ph_tpu import metad

            mp = metad.MetadParams(
                stride=max(1, int(round(50.0 / ecfg.dt))),
                **cfg["metad"])
        dg = titration.calibrate_dG_ref_metad(
            ts, tst, ecfg, bias=bias, kspace_ep=kspace_ep,
            metad_params=mp, n_steps=int(args.samples))
        print(json.dumps({"dG_ref_per_site": [float(d) for d in dg],
                          "method": "metad"}))
        return
    dG, (nodes, prof) = titration.calibrate_dG_ref_tiled(
        ts, tst, ecfg, bias=bias, kspace_ep=kspace_ep,
        equil_steps=int(args.window_equil), sample_steps=int(args.samples),
        return_profile=True)
    print(json.dumps({
        "dG_ref": dG,
        "lambda_nodes": nodes.tolist(),
        "dUdlam_profile": [float(p) for p in prof],
    }))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="constant_ph_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run", help="run an MD simulation from a config")
    p_run.add_argument("config")
    p_run.set_defaults(fn=cmd_run)
    p_t = sub.add_parser("titrate", help="pH titration sweep")
    p_t.add_argument("config")
    p_t.add_argument("--ph", required=True, help="comma-separated pH values")
    p_t.add_argument("--method", choices=["rex", "metad"], default="rex",
                     help="replica exchange (canonical engine) or "
                          "λ-metadynamics walkers (tiled engine, full-Δq)")
    p_t.set_defaults(fn=cmd_titrate)
    p_c = sub.add_parser("calibrate",
                         help="dG_ref calibration (TI site 0 / metad all)")
    p_c.add_argument("config")
    p_c.add_argument("--equil", default=2000)
    p_c.add_argument("--window-equil", default=1000)
    p_c.add_argument("--samples", default=5000)
    p_c.add_argument("--method", choices=["ti", "metad"], default="ti")
    p_c.set_defaults(fn=cmd_calibrate)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
