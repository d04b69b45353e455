"""Full-Δq multi-site titration via well-tempered λ-metadynamics.

Why: at FULL Δq coupling the 20-site HEWL-scale system is metastable on
pH-REX block timescales (round-2 finding, results/
titration_rex_multisite_fullq_v5e.json: near-pK rungs freeze; flip times
10-100 ps). This driver replaces flip-counting with the metadynamics
free-energy estimator (constant_ph_tpu/metad.py): one replica per pH rung
(vmapped; no swaps — the history bias drives the crossings), full Δq,
DEFAULT Donnini landscape, per-site deprotonated fractions read off the
converged per-site bias profiles.

Checkpoint/resume: the bias tables live inside TiledState, so the REX
driver's leaf-based .npz checkpoint works unchanged (the axon TPU worker
can crash mid-run — memory: axon-tpu-environment).

Usage (HEWL scale, ~27k atoms, 20 sites, one real v5e):
  python examples/titration_metad_multisite.py --chunks 300
Smoke (CPU):
  python examples/titration_metad_multisite.py --small --cpu \
      --chunks 4 --steps-per-chunk 48
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def save_ckpt(path, batch, chunks_done, dG, W, bufw, tail_sum, tail_n,
              cls_offs=""):
    leaves, _ = jax.tree_util.tree_flatten(jax.device_get(batch))
    np.savez(path + ".tmp.npz", chunks_done=chunks_done, dG=dG, W=W,
             bufw=bufw, tail_sum=tail_sum, tail_n=tail_n,
             cls_offs=np.str_(cls_offs),
             n_leaves=len(leaves),
             **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(path + ".tmp.npz", path)


def load_ckpt(path, template_batch, bufw, n_groups):
    d = np.load(path)
    ck_bufw = int(d["bufw"]) if "bufw" in d.files else -1
    assert ck_bufw == bufw, (
        f"checkpoint was written with --buffer-waters {ck_bufw}, run "
        f"requests {bufw}: different physics, refusing to resume")
    leaves, treedef = jax.tree_util.tree_flatten(template_batch)
    # forward-tolerant: state fields appended AFTER the checkpoint was
    # written flatten at the tail (flax struct = dataclass field order)
    # and keep their template values; fewer saved leaves than template
    # leaves is fine, more is a real mismatch
    n_saved = int(d["n_leaves"])
    assert n_saved <= len(leaves), "checkpoint/layout mismatch"
    if d["leaf0"].shape != leaves[0].shape:
        raise SystemExit(
            f"checkpoint batch shape {d['leaf0'].shape} != run template "
            f"{leaves[0].shape} (different --replicas/--walkers-per-ph or "
            f"tile layout) — delete {path} to start fresh")
    new = [jnp.asarray(d[f"leaf{i}"], leaves[i].dtype)
           if i < n_saved else leaves[i]
           for i in range(len(leaves))]
    tail_n = np.asarray(d["tail_n"])
    if tail_n.ndim == 0:      # pre-round-4 checkpoints stored a scalar
        tail_n = np.full(n_groups, int(tail_n))
    return (jax.tree_util.tree_unflatten(treedef, new), int(d["chunks_done"]),
            np.asarray(d["tail_sum"]), tail_n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=9,
                    help="pH rungs (bias-sharing walker groups)")
    ap.add_argument("--walkers-per-ph", type=int, default=1,
                    help=">1 enables multiple-walkers metadynamics: "
                         "same-pH walkers share one bias table (hills "
                         "merged per chunk, delayed-bias scheme)")
    ap.add_argument("--mesh-walkers", type=int, default=0,
                    help=">1 runs the per-chunk hill merge as ONE "
                         "shard_map+psum collective over an N-device "
                         "mesh (metad.make_mesh_group_merge — the "
                         "MPI_Allreduce analog, fix_constant_pH.cpp:274) "
                         "and shards the replica batch over the same "
                         "mesh. Requires --walkers-per-ph > 1 and "
                         "replicas*walkers divisible by N. Frozen-base "
                         "deltas (order-free) instead of the sequential "
                         "in-host merge")
    ap.add_argument("--ph-min", type=float, default=3.0)
    ap.add_argument("--ph-max", type=float, default=7.0)
    ap.add_argument("--chunks", type=int, default=200)
    ap.add_argument("--steps-per-chunk", type=int, default=1200)
    ap.add_argument("--cal-steps", type=int, default=3000)
    ap.add_argument("--dg-ref", type=float, default=None,
                    help="skip the quick TI calibration and use this "
                         "dG_ref (kcal/mol). The in-driver 3 ps/node TI "
                         "under-samples water reorganization around the "
                         "spread-buffer charging sites by ~8 kcal/mol "
                         "(measured round 3: quick TI -32.2 vs 8 ps/node "
                         "-39.5, results/hewl_ti_recal*_v5e.json) — for "
                         "production runs pass the long-TI constant from "
                         "examples/recalibrate_hewl_ti.py")
    ap.add_argument("--dg-ref-per-class", default="",
                    help="per-pK-class ΔG_ref offsets on top of --dg-ref, "
                         "as 'pK:offset,pK:offset' (kcal/mol), e.g. "
                         "'4.25:-0.89,6.5:0.12' — installs "
                         "dG_ref(site) = dg_ref + offset(class). Use when "
                         "the V-table residual analysis shows a class "
                         "median stable across checkpoints "
                         "(examples/metad_vtable_residual.py)")
    ap.add_argument("--init-tables", action="store_true",
                    help="with --init-atoms-from: also adopt the source "
                         "checkpoint's metadynamics bias tables and λ "
                         "walkers instead of starting a fresh landscape "
                         "fill. Requires --dg-ref equal to the source "
                         "run's (the V tables estimate −F of THAT "
                         "landscape) and identical metad params. With "
                         "--walkers-per-ph > 1 each pH group's table is "
                         "replicated across its walkers (multiple-walkers "
                         "refinement of an already-filled landscape)")
    ap.add_argument("--eq-steps", type=int, default=400)
    ap.add_argument("--hill", type=float, default=0.4,
                    help="initial hill height h0 (kcal/mol)")
    ap.add_argument("--sigma", type=float, default=0.03)
    ap.add_argument("--gamma", type=float, default=30.0,
                    help="well-tempered factor; the WT fill saturates "
                         "near (gamma-1)*kT, so gamma must exceed "
                         "1 + F_barrier/kT — full-dq landscapes (Donnini "
                         "bias + Marcus solvent term, 12-20 kcal) need "
                         "gamma ~ 25-40 (measured: gamma=12 never "
                         "crossed; see DESIGN.md sec 8)")
    ap.add_argument("--stride", type=int, default=48,
                    help="MD steps per hill")
    ap.add_argument("--buffer-waters", type=int, default=8,
                    help="waters sharing each site's compensating +1e; "
                         "Marcus reorganization scales as the buffer's "
                         "per-molecule dq^2, and one water carrying the "
                         "full charge raises a 15-25 kcal mid-lambda "
                         "barrier (measured: 16 kcal of WT fill at "
                         "lambda 0.42 with zero crossings) — spread it")
    ap.add_argument("--inner-steps", type=int, default=0,
                    help="split each chunk into jit calls of this many "
                         "steps (0 = whole chunk in one call). The axon "
                         "TPU worker kills device programs that run "
                         "~100 s in one XLA call (observed: 5/5 crashes "
                         "at the first 1200-step 9-replica call, while "
                         "24-step calls always pass) — 240 keeps each "
                         "call ~20 s with identical physics (deposits "
                         "happen at rebuild-block boundaries inside the "
                         "scan either way)")
    ap.add_argument("--tail-burn", type=float, default=0.5,
                    help="fraction of chunks treated as fill burn-in; "
                         "the reported estimator is the time average of "
                         "the basin fraction over the remaining tail "
                         "(DESIGN.md sec 8 rule b: final-snapshot reads "
                         "ride the most recent hill burst, +-0.1)")
    ap.add_argument("--out", default="examples/results/"
                                     "titration_metad_multisite_v5e.json")
    ap.add_argument("--ckpt", default="examples/results/"
                                      "metad_multisite_ckpt.npz")
    ap.add_argument("--init-atoms-from", default=None,
                    help="adopt the ATOMIC state (solvent + solute "
                         "coords/velocities) of an existing campaign "
                         "checkpoint instead of re-equilibrating from "
                         "the procedural build — fresh λ walkers, fresh "
                         "bias tables, the supplied --dg-ref. Water "
                         "reorganization around charging sites relaxes "
                         "over >100 ps (round-3 finding: quick TI from a "
                         "fresh build mis-calibrated by ~7 kcal/mol), so "
                         "restarting a corrected-landscape campaign from "
                         "relaxed solvent skips that burn-in. Replica "
                         "counts must match")
    ap.add_argument("--reset-tail", action="store_true",
                    help="on resume, zero the accumulated tail tally and "
                         "start a fresh averaging window (use with a "
                         "--tail-burn past the already-done chunks when "
                         "extending a run whose earlier tail window "
                         "overlapped the mid-run fill transient: every "
                         "far-from-midpoint point passes through x~0.5 "
                         "while WT hills first push it out of its "
                         "HH-favored basin, and averaging that transient "
                         "biases the extremes toward the middle)")
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from constant_ph_tpu import metad, titration
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.parallel.replica import stack_replicas
    from constant_ph_tpu.systems.protein import solvated_polypeptide
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import (retile, retile_auto,
                                              split_system, to_tiled)

    t0 = time.time()
    cpu = jax.local_devices(backend="cpu")[0]
    build = dict(n_residues=40, sites_every=2, box_len=66.0,
                 water_spacing=3.1, cutoff=8.0, skin=0.8,
                 coul_style="dsf", alpha=0.2, pH=5.0, dq_scale=1.0,
                 n_buffer_waters=args.buffer_waters)
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
    log(f"{sys_.state.x.shape[0]} atoms, {S} sites, full dq, "
        f"Donnini landscape")

    # metadynamics makes the DEFAULT landscape samplable — no softening
    bias = BiasParams()
    mp = metad.MetadParams(nbins=241, sigma=args.sigma, h0=args.hill,
                           gamma=args.gamma, stride=args.stride, T=300.0)

    resume = os.path.exists(args.ckpt)
    init_src = args.init_atoms_from
    if init_src and not resume:
        # adopt the tile layout of the source checkpoint; atoms are
        # copied into the fresh batch after stacking (below)
        if args.dg_ref is None:
            raise SystemExit("--init-atoms-from needs an explicit "
                             "--dg-ref (the whole point is installing a "
                             "corrected landscape on relaxed solvent)")
        hdr = np.load(init_src)
        W_saved = int(hdr["W"])
        with jax.default_device(cpu):
            ts, tst = retile(ts, tst, W_saved)
        dG = args.dg_ref
        ts.spec = titration.apply_dG_ref(ts.spec, dG)
        log(f"init atoms from {init_src}: W={W_saved}, fresh landscape "
            f"at dG_ref={dG:.3f}")
    elif resume:
        hdr = np.load(args.ckpt)
        W_saved, dG = int(hdr["W"]), float(hdr["dG"])
        if args.dg_ref is not None and abs(args.dg_ref - dG) > 1e-6:
            raise SystemExit(
                f"checkpoint was run at dG_ref={dG:.3f}; --dg-ref "
                f"{args.dg_ref:.3f} is a different landscape — its bias "
                f"tables are invalid. Delete {args.ckpt} to start fresh.")
        with jax.default_device(cpu):
            ts, tst = retile(ts, tst, W_saved)
        ts.spec = titration.apply_dG_ref(ts.spec, dG)
        log(f"resuming from {args.ckpt}: W={W_saved}, dG_ref={dG:.3f}")
    else:
        cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=300.0,
                              gamma=0.01, lambda_thermostat="langevin",
                              rebuild_every=8, force_cap=50.0)
        eng = TiledEngine(ts, cfg_eq, bias=bias)
        tst, _ = jax.jit(eng.make_minimize(400))(tst)
        run_eq = jax.jit(eng.make_run(args.eq_steps))
        for _ in range(3):
            tst, ov, obs = run_eq(tst)
        occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
        with jax.default_device(cpu):
            ts, tst = retile_auto(ts, jax.tree.map(jnp.asarray,
                                                   jax.device_get(tst)), occ,
                                  margin_min=10, margin_max=18)
        tst = jax.device_put(tst, dev)
        log(f"equilibrated, occ={occ}, W={ts.params.W} "
            f"({time.time()-t0:.0f}s)")

        if args.dg_ref is not None:
            dG = args.dg_ref
            ts.spec = titration.apply_dG_ref(ts.spec, dG)
            log(f"using supplied dG_ref = {dG:.3f} kcal/mol")
        else:
            cfg_cal = EngineConfig(dt=1.0, thermostat="langevin", T=300.0,
                                   gamma=0.01, lambda_thermostat="langevin",
                                   rebuild_every=12)
            dG = titration.calibrate_dG_ref_tiled(
                ts, tst, cfg_cal, bias=bias, site=0,
                equil_steps=max(100, args.cal_steps // 6),
                sample_steps=args.cal_steps)
            ts.spec = titration.apply_dG_ref(ts.spec, dG)
            log(f"TI dG_ref = {dG:.3f} kcal/mol ({time.time()-t0:.0f}s)")

    cls_offs = titration.parse_class_offsets(args.dg_ref_per_class)
    if resume:
        hdr = np.load(args.ckpt)
        saved_cls = str(hdr["cls_offs"]) if "cls_offs" in hdr.files else ""
        if titration.parse_class_offsets(saved_cls) != cls_offs:
            raise SystemExit(
                f"checkpoint was run with per-class offsets "
                f"'{saved_cls}'; --dg-ref-per-class "
                f"'{args.dg_ref_per_class}' is a different landscape — "
                f"its bias tables are invalid")
    if cls_offs:
        ts.spec = titration.apply_dG_ref_per_class(ts.spec, dG, cls_offs)
        log(f"per-class dG_ref offsets installed: {cls_offs}")

    # ---- one metadynamics walker per pH rung ----
    G = args.replicas                     # pH rungs (bias-sharing groups)
    wpp = args.walkers_per_ph
    R = G * wpp
    pHs = np.linspace(args.ph_min, args.ph_max, G)
    # reflective λ walls just outside the metad grid (−0.1..1.1): the
    # EngineConfig defaults (±0.5/1.5) leave a force-free plateau beyond
    # the erf walls where an escaped walker drifts for free and deposits
    # nothing (round-5 nandump root cause, metad.lookup docstring)
    cfg = EngineConfig(dt=2.0, thermostat="langevin", T=300.0, gamma=0.002,
                       lambda_thermostat="langevin", lambda_gamma=0.05,
                       rebuild_every=12, lam_min=-0.12, lam_max=1.12)
    # wpp > 1: multiple-walkers metadynamics — same-pH walkers run against
    # a bias FROZEN for the chunk, then their hill sequences merge into
    # the shared table (metad.deposit_many, the delayed-bias scheme);
    # wpp == 1: hills deposit in-run at block boundaries.
    eng = TiledEngine(ts, cfg, bias=bias, metad=mp, metad_frozen=(wpp > 1))
    if wpp > 1 and args.steps_per_chunk > 4 * args.stride:
        # long frozen-bias chunks dump correlated hill bursts at the merge
        # and overshoot (measured: 20 hills/walker/merge biased the basin
        # fraction by +0.15; ≤4 converges — tests/test_metad.py)
        log(f"WARNING: steps-per-chunk {args.steps_per_chunk} > 4x stride "
            f"{args.stride}; shared-walker merges will dump "
            f"{args.steps_per_chunk // args.stride} hills/walker — use "
            f"shorter chunks for wpp>1")
    V0, dV0 = metad.init_tables(S, mp)
    reps = []
    for g in range(G):
        lam0 = np.where(pks > pHs[g], 0.05, 0.95).astype(np.float32)
        for w in range(wpp):
            reps.append(tst.replace(
                pH=jnp.asarray(pHs[g], tst.pH.dtype),
                lam=jnp.asarray(lam0),
                v_lam=jnp.zeros_like(tst.v_lam),
                metad_v=V0, metad_dv=dV0,
                key=jax.random.PRNGKey(2000 + g * 131 + w)))
    batch = stack_replicas(reps)
    chunks_done = 0
    # tail-time-averaged basin fractions (DESIGN.md §8 rule b): sum of
    # per-chunk deprotonated_fraction over chunks past the burn-in.
    # tail_n is PER pH GROUP: a rollback in one group must not skew the
    # divisor of the healthy groups (advisor finding, round 3).
    tail_sum, tail_n = np.zeros((G, S)), np.zeros(G, dtype=np.int64)
    if resume:
        batch, chunks_done, tail_sum, tail_n = load_ckpt(
            args.ckpt, batch, args.buffer_waters, G)
        if args.reset_tail:
            tail_sum, tail_n = (np.zeros((G, S)),
                                np.zeros(G, dtype=np.int64))
            log("tail tally reset (fresh averaging window)")
        batch = jax.device_put(batch, dev)
        log(f"resumed at chunk {chunks_done} (tail_n={tail_n})")
    elif init_src:
        src = np.load(init_src)
        R_src = int(src["leaf0"].shape[0])
        if R_src == R:
            tile = 1
        elif R_src * wpp == R:
            # source ran one walker per pH group; fan each source
            # replica out to this run's wpp same-pH walkers (g-major
            # replica order on both sides, so jnp.repeat aligns
            # source group g with walkers (g, 0..wpp-1))
            tile = wpp
        else:
            raise SystemExit(f"--init-atoms-from has {R_src} replicas, "
                             f"run wants {R} (= {G} groups x {wpp} "
                             f"walkers); need R_src == R or R_src == "
                             f"groups")
        template_src = jax.tree.map(lambda a: a[::tile], batch)
        batch_src, _, _, _ = load_ckpt(init_src, template_src,
                                       args.buffer_waters, G)
        if tile > 1:
            batch_src = jax.tree.map(
                lambda a: jnp.repeat(a, tile, axis=0), batch_src)
        # relaxed solvent + solute, everything else fresh (λ walkers,
        # bias tables, keys, dG landscape set above)
        batch = batch.replace(
            wx=batch_src.wx, wv=batch_src.wv, wvalid=batch_src.wvalid,
            wid=batch_src.wid, sx=batch_src.sx, sv=batch_src.sv,
            box=batch_src.box)
        if args.init_tables:
            # adopting the source's V tables only makes sense on (near)
            # the same landscape: the table IS an estimate of −F under
            # the source's dG_ref. Per-class offsets of ~1 kcal on top
            # are fine — WT deposition re-fills the small mismatch.
            dG_src = float(src["dG"])
            if abs(dG_src - dG) > 1e-6:
                raise SystemExit(
                    f"--init-tables: source landscape dG_ref={dG_src} "
                    f"!= --dg-ref {dG}; the adopted V tables would "
                    f"estimate the wrong free energy")
            # SANITIZE the adopted walkers: clamp λ into the erf-wall
            # window and rethermalize v_λ from zero — the stage-2 source
            # carries one corrupt-but-finite replica (λ=1.49, |v_λ|=1.55)
            batch = batch.replace(
                metad_v=batch_src.metad_v, metad_dv=batch_src.metad_dv,
                lam=jnp.clip(batch_src.lam, -0.05, 1.05),
                v_lam=jnp.zeros_like(batch_src.v_lam))
            log("adopted source bias tables + clamped lambda walkers "
                "(landscape refinement mode)")
        # health-screen the ADOPTED atoms: a corrupt-but-finite source
        # replica (stage-2's pH-5 walker: positions 1e10 Å, velocities
        # 5e9 Å/fs) must not seed the campaign. Bad replicas borrow the
        # nearest healthy replica's atomic state (solvent configs differ
        # across pH only through protonation, and λ re-relaxes in ps).
        from constant_ph_tpu.parallel.replica import replica_healthy
        ok_src = np.asarray(replica_healthy(
            batch, lam_min=-0.125, lam_max=1.125, v_lam_max=0.5))
        if not ok_src.all():
            badr = np.where(~ok_src)[0]
            good = np.where(ok_src)[0]
            if good.size == 0:
                raise SystemExit("--init-atoms-from: every source "
                                 "replica is unhealthy")
            sub = good[np.argmin(
                np.abs(good[:, None] - badr[None, :]), axis=0)]
            srcmap = np.arange(R)
            srcmap[badr] = sub
            log(f"source replicas {badr.tolist()} unhealthy -> adopting "
                f"atoms from {sub.tolist()} instead")
            sm = jnp.asarray(srcmap)
            batch = batch.replace(
                wx=batch.wx[sm], wv=batch.wv[sm],
                wvalid=batch.wvalid[sm], wid=batch.wid[sm],
                sx=batch.sx[sm], sv=batch.sv[sm])
        batch = jax.device_put(batch, dev)
        save_ckpt(args.ckpt, batch, 0, dG, ts.params.W,
                  args.buffer_waters, tail_sum, tail_n,
                  args.dg_ref_per_class)
        log("adopted relaxed atoms; wrote chunk-0 checkpoint")
    else:
        # checkpoint the equilibrated+calibrated state BEFORE the first
        # chunk: the axon TPU worker can crash within minutes (observed
        # 3x in round 3), and eq+cal are ~8 min of lost work per retry
        save_ckpt(args.ckpt, batch, 0, dG, ts.params.W,
                  args.buffer_waters, tail_sum, tail_n,
                  args.dg_ref_per_class)
        log("wrote post-calibration checkpoint (chunk 0)")

    inner = args.inner_steps or args.steps_per_chunk
    if args.steps_per_chunk % inner:
        raise SystemExit("--inner-steps must divide --steps-per-chunk")
    run_inner = jax.jit(jax.vmap(eng.make_run(inner, detailed_flags=True)))

    def runv(b):
        """One chunk as steps_per_chunk//inner jit calls; flags OR,
        λ traces concatenate (same physics — see --inner-steps help)."""
        caps, drifts, lams = [], [], []
        for _ in range(args.steps_per_chunk // inner):
            b, (ov_c, ov_d), obs = run_inner(b)
            caps.append(ov_c)
            drifts.append(ov_d)
            lams.append(obs.lam)
        ov_c = jnp.stack(caps).any(axis=0)
        ov_d = jnp.stack(drifts).any(axis=0)
        obs = obs.replace(lam=jnp.concatenate(lams, axis=1))
        return b, (ov_c, ov_d), obs
    mesh_merge = None
    if args.mesh_walkers > 1:
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P
        D = args.mesh_walkers
        if wpp <= 1:
            raise SystemExit("--mesh-walkers needs --walkers-per-ph > 1")
        if wpp % D:
            raise SystemExit("--mesh-walkers must divide --walkers-per-ph")
        devs = jax.devices()
        if len(devs) < D:
            raise SystemExit(f"--mesh-walkers {D} but only {len(devs)} "
                             f"devices visible")
        mesh = Mesh(np.array(devs[:D]), ("walk",))
        mesh_merge = jax.jit(metad.make_mesh_group_merge(mesh, "walk", mp))
        if R % D == 0:
            # shard the replica batch too: the vmapped run then executes
            # SPMD over the mesh (GSPMD partitions the leading axis)
            batch = jax.device_put(
                batch, NamedSharding(mesh, P("walk")))
        log(f"mesh walkers: {D}-device hill-merge collective")
    if wpp > 1:
        dep_groups = jax.jit(jax.vmap(
            lambda V, dV, seq: metad.deposit_many(V, dV, seq, mp)))
    # per-replica failure detection + rollback (SURVEY.md §5.3): one NaN
    # walker must not poison its bias table for the rest of the run
    from constant_ph_tpu.parallel.replica import (replica_healthy,
                                                  rollback_replicas)
    n_overflow = 0
    n_rollback = 0
    # health = finite AND λ inside the walls AND |v_λ| sane — a corrupt-
    # but-finite walker must roll back too (stage-2 carried one for ~50
    # chunks; replica_healthy docstring)
    replica_finite = jax.jit(lambda b: replica_healthy(
        b, lam_min=-0.125, lam_max=1.125, v_lam_max=0.5))

    def tail_frac(b):
        """Current per-group deprotonated fractions off the bias tables."""
        v_groups = b.metad_v.reshape(G, wpp, S, mp.nbins)[:, 0]
        return np.asarray(metad.deprotonated_fraction(
            v_groups.reshape(G * S, mp.nbins), mp)).reshape(G, S)

    def write_report(chunks):
        frac = np.where(tail_n[:, None] > 0,
                        tail_sum / np.maximum(tail_n, 1)[:, None],
                        tail_frac(batch))
        out = _report(pks, pHs, frac, args, dG,
                      int(sys_.state.x.shape[0]), n_overflow,
                      time.time() - t0, chunks, mp, tail_n,
                      n_rollback=n_rollback)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        return out

    # c counts PRODUCTIVE (fully finite) chunks; a rollback retries the
    # chunk instead of consuming it (advisor finding, round 3). The
    # attempt cap bounds a persistently-diverging walker.
    c = chunks_done
    attempts = 0
    max_attempts = 2 * (args.chunks - chunks_done) + 20
    out = None
    while c < args.chunks and attempts < max_attempts:
        attempts += 1
        prev = batch                      # pre-chunk state (rollback source)
        batch, (ov_cap, ov_drift), obs = runv(batch)
        fin = np.asarray(replica_finite(batch))
        ok = bool(fin.all())
        if not ok:
            bad = np.where(~fin)[0].tolist()
            n_rollback += len(bad)
            log(f"chunk {c+1}: replicas {bad} non-finite -> "
                f"rollback+reseed (total rollbacks {n_rollback})")
            # diagnostic dump BEFORE the state is discarded (VERDICT r4
            # weak-4: rollbacks were tolerated, never root-caused): the
            # pre-chunk state of each bad replica (a valid state that
            # diverges within one chunk — replayable offline), its
            # post-chunk wreck, and the λ trace of the dying chunk
            try:
                idx = np.asarray(bad)
                take = lambda t: jax.tree.map(
                    lambda a: np.asarray(a)[idx], jax.device_get(t))
                pre_l, _ = jax.tree_util.tree_flatten(take(prev))
                post_l, _ = jax.tree_util.tree_flatten(take(batch))
                dump = args.ckpt.replace(".npz", f"_nandump_c{c+1}.npz")
                np.savez(
                    dump, bad=idx, chunk=c + 1, n_groups=G, wpp=wpp,
                    dG=dG, bufw=args.buffer_waters,
                    steps_per_chunk=args.steps_per_chunk,
                    lam_trace=np.asarray(obs.lam)[idx],
                    n_leaves=len(pre_l),
                    **{f"pre{i}": l for i, l in enumerate(pre_l)},
                    **{f"post{i}": l for i, l in enumerate(post_l)})
                log(f"  pre/post-NaN replica state dumped to {dump}")
            except Exception as e:              # never kill the campaign
                log(f"  nandump failed: {e!r}")
            batch = rollback_replicas(batch, prev, jnp.asarray(fin), c)
        else:
            n_overflow += int(np.asarray(ov_cap).sum())
        # per-group bookkeeping: a group whose walkers all stayed finite
        # keeps its chunk (hill merge + tail tally) even if another
        # group rolled back (advisor finding: don't drop healthy groups)
        grp_ok = fin.reshape(G, wpp).all(axis=1)          # (G,)
        if wpp > 1 and grp_ok.any():
            # merge this chunk's hills per pH group: sub-sample each
            # walker's λ trace at the hill pace, then either (a) one
            # cross-device psum collective on frozen-base deltas
            # (--mesh-walkers) or (b) interleave walkers time-major and
            # sequential-deposit into the shared table (in-host)
            lam_tr = obs.lam[:, mp.stride - 1::mp.stride]   # (R, K, S)
            K = lam_tr.shape[1]
            Vg = batch.metad_v.reshape(G, wpp, S, mp.nbins)[:, 0]
            dVg = batch.metad_dv.reshape(G, wpp, S, mp.nbins)[:, 0]
            if mesh_merge is not None:
                seq4 = lam_tr.reshape(G, wpp, K, S)
                Vg_new, dVg_new = mesh_merge(Vg, dVg, seq4)
            else:
                seq = lam_tr.reshape(G, wpp, K, S).transpose(0, 2, 1, 3)
                seq = seq.reshape(G, K * wpp, S)
                Vg_new, dVg_new = dep_groups(Vg, dVg, seq)
            gm = jnp.asarray(grp_ok)[:, None, None]
            Vg = jnp.where(gm, Vg_new, Vg)        # NaN traces never merge
            dVg = jnp.where(gm, dVg_new, dVg)
            batch = batch.replace(
                metad_v=jnp.repeat(Vg, wpp, axis=0),
                metad_dv=jnp.repeat(dVg, wpp, axis=0))
        if c + 1 > int(args.tail_burn * args.chunks) and grp_ok.any():
            fr = tail_frac(batch)
            tail_sum[grp_ok] += fr[grp_ok]
            tail_n[grp_ok] += 1
        if ok:
            c += 1
        # checkpoint on the cadence AND after rollbacks (the rolled-back
        # state is valid; losing it to a worker crash wastes the retry)
        if (ok and c % args.ckpt_every == 0) or c == args.chunks or not ok:
            save_ckpt(args.ckpt, batch, c, dG, ts.params.W,
                      args.buffer_waters, tail_sum, tail_n,
                      args.dg_ref_per_class)
        if ok and (c % 5 == 0 or c == args.chunks):
            out = write_report(c)
            log(f"chunk {c}/{args.chunks}: "
                f"mad={out['summary']['mean_abs_dev']:.4f} "
                f"overflow={n_overflow} ({time.time()-t0:.0f}s)")
    if attempts >= max_attempts and c < args.chunks:
        log(f"stopping after {attempts} attempts at chunk {c} "
            f"(persistent rollbacks)")
    out = out if out is not None and c >= args.chunks else write_report(c)
    log(f"done in {time.time()-t0:.0f}s -> {args.out}")
    print(json.dumps(out["summary"]))


def _report(pks, pHs, frac, args, dG, n_atoms, n_overflow, wall, chunks, mp,
            tail_n=0, n_rollback=0):
    per_site = []
    devs = []
    for i in range(len(pks)):
        pts = []
        for r, p in enumerate(pHs):
            meas = float(frac[r, i])
            hh = 1.0 / (1.0 + 10.0 ** (pks[i] - p))
            pts.append({"pH": float(p), "deprotonated": meas, "hh": hh})
            devs.append(abs(meas - hh))
        per_site.append({"site": i, "pK": float(pks[i]), "curve": pts})
    return {
        "method": "well-tempered lambda-metadynamics (per-site WT hills, "
                  "basin-integrated free-energy estimator)",
        "system": {"atoms": n_atoms, "sites": len(pks),
                   "pK": pks.tolist(), "dq_scale": 1.0,
                   "n_buffer_waters": args.buffer_waters,
                   "landscape": "Donnini Table-S2 default"},
        "estimator": ("tail-time-averaged basin fraction "
                      f"(per-group n={np.asarray(tail_n).tolist()} chunks)"
                      if np.any(np.asarray(tail_n) > 0)
                      else "final-snapshot basin fraction (burn-in)"),
        "metad": {"h0": args.hill, "sigma": args.sigma,
                  "gamma": args.gamma, "stride": args.stride,
                  "nbins": mp.nbins,
                  "walkers_per_ph": args.walkers_per_ph},
        "dG_ref": dG, "dg_ref_per_class": args.dg_ref_per_class,
        "replicas": len(pHs), "chunks_done": chunks,
        "steps_per_chunk": args.steps_per_chunk,
        "n_overflow_blocks": n_overflow, "n_rollbacks": n_rollback,
        "wall_s": wall,
        "per_site": per_site,
        "summary": {"mean_abs_dev": float(np.mean(devs)),
                    "max_abs_dev": float(np.max(devs))},
    }


if __name__ == "__main__":
    main()
