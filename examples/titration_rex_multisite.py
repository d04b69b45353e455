"""Converged multi-site titration curves at HEWL scale (BASELINE configs
4+5 combined): the 27k-atom, 20-site solvated polypeptide under pH replica
exchange, one replica per pH rung (vmapped/shardable batch —
parallel/replica.py), with per-site deprotonated-fraction curves vs the
per-site Henderson–Hasselbalch expectation.

This is the titration purpose of the reference fix
(fix_constant_pH.cpp:111, the pH driving term) demonstrated at the
reference's production scale: round 1 only showed protonation-state
STABILITY here; this run samples actual barrier crossings through the
pH ladder.

    python examples/titration_rex_multisite.py [--replicas 10]
        [--swaps 160] [--steps-per-swap 2000]

Writes examples/results/titration_rex_multisite_v5e.json after every
checkpoint interval, so a truncated run still leaves usable data.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def save_ckpt(path, batch, key, frac_sum, frac_n, acc, n_overflow, s_done,
              dG, W):
    """Full driver state → one .npz (checkpoint.py §5.4 policy, extended
    to the vmapped replica batch + host-side accumulators), so a crashed
    TPU worker costs at most one checkpoint interval."""
    leaves, _ = jax.tree_util.tree_flatten(jax.device_get(batch))
    phs = np.array(sorted(frac_sum))
    np.savez(path + ".tmp.npz",
             key=np.asarray(key),
             frac_sum=np.stack([frac_sum[p] for p in phs]),
             frac_n=np.array([frac_n[p] for p in phs]),
             phs=phs, acc=acc, n_overflow=n_overflow, s_done=s_done,
             dG=dG, W=W, n_leaves=len(leaves),
             **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(path + ".tmp.npz", path)


def load_ckpt(path, template_batch):
    d = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template_batch)
    assert int(d["n_leaves"]) == len(leaves), "checkpoint/layout mismatch"
    new = [jnp.asarray(d[f"leaf{i}"], leaves[i].dtype)
           for i in range(len(leaves))]
    batch = jax.tree_util.tree_unflatten(treedef, new)
    phs = d["phs"]
    frac_sum = {float(p): d["frac_sum"][i] for i, p in enumerate(phs)}
    frac_n = {float(p): int(d["frac_n"][i]) for i, p in enumerate(phs)}
    return (batch, jnp.asarray(d["key"], jnp.uint32), frac_sum, frac_n,
            float(d["acc"]), int(d["n_overflow"]), int(d["s_done"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--swaps", type=int, default=160)
    ap.add_argument("--steps-per-swap", type=int, default=2000)
    ap.add_argument("--ph-min", type=float, default=3.0)
    ap.add_argument("--ph-max", type=float, default=7.0)
    ap.add_argument("--cal-steps", type=int, default=3000)
    ap.add_argument("--eq-steps", type=int, default=400,
                    help="steps per equilibration block (3 blocks)")
    ap.add_argument("--out", default="examples/results/"
                                     "titration_rex_multisite_v5e.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny system for smoke-testing the driver logic")
    ap.add_argument("--ckpt", default="examples/results/"
                                      "rex_multisite_ckpt.npz")
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--donnini-bias", action="store_true",
                    help="use the stiff Donnini Table-S2 landscape instead "
                         "of the soft sampling landscape (see below)")
    ap.add_argument("--dq-scale", type=float, default=1.0,
                    help="site Δq scale; <1 reduces the solvent-"
                         "reorganization barrier (Δq²) so near-pK rungs "
                         "equilibrate within a block — the same knob the "
                         "single-site REX curve uses (dq 0.15). At 1.0 the "
                         "full-Δq landscape is metastable on 2-ps blocks "
                         "and the measured curve is a REX-shuttled step "
                         "function (see results/..._fullq_v5e.json)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from constant_ph_tpu import titration
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.parallel.replica import (
        make_rex_runner_tiled, stack_replicas)
    from constant_ph_tpu.systems.protein import solvated_polypeptide
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import retile_auto, split_system, to_tiled

    t0 = time.time()
    cpu = jax.local_devices(backend="cpu")[0]
    build = dict(n_residues=40, sites_every=2, box_len=66.0,
                 water_spacing=3.1, cutoff=8.0, skin=0.8,
                 coul_style="dsf", alpha=0.2, pH=5.0,
                 dq_scale=args.dq_scale)
    split = dict(skin=0.8, tile_safety=1.72)
    if args.small:
        build.update(n_residues=8, box_len=26.0, water_spacing=3.4,
                     cutoff=6.0, skin=1.2)
        split = dict(skin=1.2, tile_safety=1.72)
    with jax.default_device(cpu):
        sys_ = solvated_polypeptide(**build)
        ts = split_system(sys_, **split)
        tst = to_tiled(ts, sys_.state)
    dev = jax.devices()[0]
    tst = jax.device_put(tst, dev)
    pks = np.asarray(sys_.spec.pK)
    S = len(pks)
    log(f"{sys_.state.x.shape[0]} atoms, {S} sites "
        f"(pK classes {sorted(set(pks.tolist()))})")

    # Sampling landscape: the Donnini Table-S2 constants put ~4.5 kcal of
    # BIAS barrier (deep a=0.034 end wells + d=2 center) on top of the
    # solvent-reorganization barrier — λ transitions then take 10-100 ps
    # and a 2-ps-per-swap ladder samples a frozen step function (round-1
    # state). The bias is a symmetric sampling device (it cancels in the
    # equilibrium protonation — tests/test_titration.py validates both
    # landscapes give the HH equilibrium), so production uses the soft
    # landscape + slope-12 switching, same as the single-site REX curve.
    bias = (BiasParams() if args.donnini_bias
            else BiasParams(a=0.12, k=1.2, d=0.8, switch_slope=12.0))

    resume = os.path.exists(args.ckpt)
    if resume:
        hdr = np.load(args.ckpt)
        W_saved, dG = int(hdr["W"]), float(hdr["dG"])
        from constant_ph_tpu.tiled.layout import retile
        with jax.default_device(cpu):
            ts, tst = retile(ts, tst, W_saved)
        ts.spec = titration.apply_dG_ref(ts.spec, dG)
        log(f"resuming from {args.ckpt}: W={W_saved}, dG_ref={dG:.3f}")
    else:
        # ---- minimize + thermal equilibration + cost-aware retile ----
        cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0,
                              gamma=0.01, lambda_thermostat="langevin",
                              rebuild_every=8, force_cap=50.0)
        eng = TiledEngine(ts, cfg_eq, bias=bias)
        tst, _ = jax.jit(eng.make_minimize(400))(tst)
        run_eq = jax.jit(eng.make_run(args.eq_steps))
        for _ in range(3):
            tst, ov, obs = run_eq(tst)
        occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
        # generous margin: the replica batch is vmapped, no in-loop retile
        with jax.default_device(cpu):
            ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                                   jax.device_get(tst)), occ,
                                  margin_min=10, margin_max=18)
        tst = jax.device_put(tst, dev)
        log(f"equilibrated, occ={occ}, W={ts.params.W} "
            f"({time.time()-t0:.0f}s)")

        # ---- shared TI calibration (one headgroup -> one dG_ref) ----
        cfg_cal = EngineConfig(dt=1.0, thermostat="langevin", T=300.0,
                               gamma=0.01, lambda_thermostat="langevin",
                               rebuild_every=12)
        dG = titration.calibrate_dG_ref_tiled(
            ts, tst, cfg_cal, bias=bias, site=0,
            equil_steps=max(100, args.cal_steps // 6),
            sample_steps=args.cal_steps)
        ts.spec = titration.apply_dG_ref(ts.spec, dG)
        log(f"TI dG_ref = {dG:.3f} kcal/mol ({time.time()-t0:.0f}s)")

    # ---- replica ladder ----
    R = args.replicas
    pHs = np.linspace(args.ph_min, args.ph_max, R)
    cfg = EngineConfig(dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", lambda_gamma=0.05,
                       rebuild_every=12)
    eng = TiledEngine(ts, cfg, bias=bias)
    reps = []
    for r in range(R):
        lam0 = np.where(pks > pHs[r], 0.05, 0.95).astype(np.float32)
        reps.append(tst.replace(
            pH=jnp.asarray(pHs[r], tst.pH.dtype),
            lam=jnp.asarray(lam0),
            v_lam=jnp.zeros_like(tst.v_lam),
            key=jax.random.PRNGKey(1000 + r)))
    batch = stack_replicas(reps)
    block = jax.jit(make_rex_runner_tiled(eng, args.steps_per_swap,
                                          with_stats=True))

    key = jax.random.PRNGKey(11)
    burn = args.swaps // 4
    # per (pH rung, site): accumulated deprotonated fraction; bin by the
    # pH each replica HELD DURING the block (swap happens after the MD).
    # Keys snap to the f32-cast rung values: batch.pH is f32, so a rung
    # like 3.4444… must be keyed by its f32 round-trip or the lookup
    # below KeyErrors on any non-f32-exact ladder.
    ph_keys = np.asarray(np.asarray(pHs, np.float32), np.float64).round(6)
    frac_sum = {float(p): np.zeros(S) for p in ph_keys}
    frac_n = {float(p): 0 for p in ph_keys}
    acc = 0.0
    n_overflow = 0
    s_start = 0
    if resume:
        (batch, key, frac_sum, frac_n, acc, n_overflow,
         s_start) = load_ckpt(args.ckpt, batch)
        batch = jax.device_put(batch, dev)
        log(f"resumed at swap {s_start}")
    for s in range(s_start, args.swaps):
        ph_during = np.asarray(batch.pH, np.float64).round(6)
        batch, key, accepted, overflow, stats = block(batch, key, s % 2)
        acc += float(jnp.mean(accepted))
        n_overflow += int(np.asarray(overflow).sum())
        if s >= burn:
            frac = np.asarray(stats["frac_deprot"], np.float64)  # (R, S)
            for r in range(R):
                frac_sum[float(ph_during[r])] += frac[r]
                frac_n[float(ph_during[r])] += 1
        if (s + 1) % 10 == 0 or s == args.swaps - 1:
            curves = _curves(pks, pHs, frac_sum, frac_n)
            out = {
                "system": {"atoms": int(sys_.state.x.shape[0]), "sites": S,
                           "pK": pks.tolist(),
                           "dq_scale": args.dq_scale},
                "dG_ref": dG,
                "replicas": R, "swaps_done": s + 1,
                "steps_per_swap": args.steps_per_swap,
                "burn_swaps": burn,
                "swap_acceptance": acc / (s + 1),
                "n_overflow_blocks": n_overflow,
                "wall_s": time.time() - t0,
                "per_site": curves["per_site"],
                "summary": curves["summary"],
            }
            with open(args.out, "w") as fh:
                json.dump(out, fh, indent=1)
            log(f"swap {s+1}/{args.swaps}: acc={acc/(s+1):.2f} "
                f"overflow={n_overflow} "
                f"mad={curves['summary'].get('mean_abs_dev')} "
                f"({time.time()-t0:.0f}s)")
        if (s + 1) % args.ckpt_every == 0:
            save_ckpt(args.ckpt, batch, key, frac_sum, frac_n, acc,
                      n_overflow, s + 1, dG, ts.params.W)
    log(f"done in {time.time()-t0:.0f}s -> {args.out}")
    print(json.dumps(out["summary"]))


def _curves(pks, pHs, frac_sum, frac_n):
    per_site = []
    devs = []
    for i in range(len(pks)):
        pts = []
        for p in sorted(frac_sum):
            n = frac_n[p]
            if n == 0:
                continue
            meas = frac_sum[p][i] / n
            hh = 1.0 / (1.0 + 10.0 ** (pks[i] - p))
            pts.append({"pH": p, "deprotonated": float(meas),
                        "hh": float(hh), "n_blocks": n})
            devs.append(abs(meas - hh))
        per_site.append({"site": i, "pK": float(pks[i]), "curve": pts})
    summary = {}
    if devs:
        summary = {
            "mean_abs_dev": float(np.mean(devs)),
            "max_abs_dev": float(np.max(devs)),
            "n_points": len(devs),
        }
    return {"per_site": per_site, "summary": summary}


if __name__ == "__main__":
    main()
