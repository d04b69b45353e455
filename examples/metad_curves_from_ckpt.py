"""Titration curves straight off a campaign checkpoint's bias tables.

The campaign driver's report tail-averages the INSTANTANEOUS V-table
estimator over the post-burn-in chunks. That average is the right noise
filter once the tables are converged, but it also integrates the mid-run
transient in which well-tempered hills push every walker OUT of its
HH-favored basin (the far-from-midpoint points pass through x≈0.5 before
the unfavored basin is filled deep enough to read the true ΔF). This
script instead evaluates the estimator once, on the FINAL tables — by
late WT time the hill height has decayed to near-nothing, so the
instantaneous profile IS the converged free-energy estimate
(metad.deprotonated_fraction docstring: "needs converged V, not
converged barrier-crossing statistics").

Emits the same per-site/per-class schema as the campaign report
(suffix `_ckpt_curves.json`) so analyze_metad_multisite.py applies.

Ref: the per-site protonation observable the reference's fix exists to
produce, /root/reference/fix_constant_pH.cpp:111 (pH driving term).

  python examples/metad_curves_from_ckpt.py \
      --ckpt examples/results/metad_ms_r4s2_ckpt.npz \
      --report examples/results/titration_metad_r4stage2_v5e.json
"""
from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--report", required=True,
                    help="campaign --out JSON (supplies pK table and "
                         "MetadParams)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--pooled", action="store_true",
                    help="use the pooled intrinsic-profile estimator "
                         "(metad.pooled_intrinsic_profile): subtract "
                         "the analytic pH driving term from every "
                         "walker's table, average the profiles per site "
                         "(and per class for the class curves), then "
                         "re-add the term at each pH. Minimum-variance; "
                         "~√(G·n_sites) less noise than per-point "
                         "tables. The acceptance-bar estimator from "
                         "round 5 on")
    ap.add_argument("--dg-ref-eval", default=None,
                    help="evaluate the pooled curves at this ΔG_ref "
                         "instead of the simulated one (a float, or "
                         "'class-fixed' for the per-class V-table fixed "
                         "point, or 'class-loo' for leave-one-out class "
                         "calibration — the honest per-site "
                         "generalization metric). Exact: ΔG_ref is a "
                         "linear tilt of the "
                         "λ Hamiltonian (metad.retilt_profile), so the "
                         "converged landscape re-evaluates at any "
                         "constant without a re-run. Requires --pooled")
    args = ap.parse_args()
    if args.dg_ref_eval is not None and not args.pooled:
        ap.error("--dg-ref-eval requires --pooled")

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from constant_ph_tpu import metad
    from constant_ph_tpu.tiled.layout import TiledState

    rep = json.load(open(args.report))
    pks = np.asarray([s["pK"] for s in rep["per_site"]])
    m = rep["metad"]
    mp = metad.MetadParams(nbins=m["nbins"], sigma=m["sigma"], h0=m["h0"],
                           gamma=m["gamma"], stride=m["stride"], T=300.0)
    d = np.load(args.ckpt)
    fields = [f.name for f in dataclasses.fields(TiledState)]
    V = np.asarray(d[f"leaf{fields.index('metad_v')}"])   # (R, S, nbins)
    pH = np.asarray(d[f"leaf{fields.index('pH')}"], np.float64)  # (R,)
    wpp = m.get("walkers_per_ph", 1) or 1
    G = len(pH) // wpp
    # walkers within a pH group share one merged table; take walker 0
    V = V.reshape(G, wpp, *V.shape[1:])[:, 0]
    pH = pH.reshape(G, wpp)[:, 0]
    S = V.shape[1]

    pooled_info = {}
    if args.pooled:
        # pooled intrinsic profiles: per-site F0 pooled over walkers,
        # per-class F0 additionally pooled over the class's sites
        # (chemically identical model compounds) — ~√(G·n_sites) less
        # noise than independent per-point tables
        D0 = float(rep["dG_ref"])
        F0 = np.asarray(metad.pooled_intrinsic_profile(
            jnp.asarray(V, jnp.float64) if V.dtype == np.float64
            else jnp.asarray(V), jnp.asarray(pks), jnp.asarray(pH), mp),
            np.float64)                                       # (S, B)
        dfs = np.asarray(metad.pooled_delta_f(jnp.asarray(F0), mp),
                         np.float64)
        pooled_info = {
            "pooled_site_delta_f_kcal": [float(x) for x in dfs],
            "pooled_global_offset_kcal": float(np.mean(dfs)),
            "pooled_fixed_point_dG_ref": float(D0 + np.mean(dfs)),
        }
        # analytic ΔG_ref re-evaluation (metad.retilt_profile): ΔG_ref
        # is a LINEAR tilt of the λ Hamiltonian, so a landscape
        # converged at D0 evaluates exactly at any other constant —
        # the calibration correction needs no re-run.
        dg_eval = np.full(S, D0)
        if args.dg_ref_eval == "class-fixed":
            # per-class fixed point: the constant at which the CLASS-
            # pooled intrinsic basin ΔF vanishes (the per-class version
            # of the V-table fixed-point calibration, VERDICT r4 items
            # 1/7). Computed from class-pooled profiles, not the mean
            # of noisy per-site delta_f.
            cls_fp = {}
            for pk in sorted(set(np.round(pks, 4).tolist())):
                sel = np.abs(pks - pk) < 1e-3
                dfc = float(np.asarray(metad.pooled_delta_f(
                    jnp.asarray(F0[sel].mean(0)[None]), mp))[0])
                cls_fp[pk] = D0 + dfc
                dg_eval[sel] = D0 + dfc
            pooled_info["dg_ref_eval_per_class"] = {
                str(k): float(v) for k, v in cls_fp.items()}
        elif args.dg_ref_eval == "class-loo":
            # leave-one-out: site i evaluates at the constant calibrated
            # on its class SIBLINGS only — no data from site i enters
            # its own calibration, so the per-site mad is a clean
            # generalization error (the class-fixed per-class mad is
            # calibrated-on-itself and measures switching-shape
            # fidelity only).
            loo = {}
            for i in range(S):
                sel = (np.abs(pks - pks[i]) < 1e-3)
                sel[i] = False
                if not sel.any():
                    sel = np.abs(pks - pks[i]) < 1e-3   # lone site
                dfc = float(np.asarray(metad.pooled_delta_f(
                    jnp.asarray(F0[sel].mean(0)[None]), mp))[0])
                dg_eval[i] = D0 + dfc
                loo[i] = D0 + dfc
            pooled_info["dg_ref_eval_loo"] = {
                str(k): float(v) for k, v in loo.items()}
        elif args.dg_ref_eval is not None:
            dg_eval[:] = float(args.dg_ref_eval)
            pooled_info["dg_ref_eval"] = float(args.dg_ref_eval)
        F0 = np.asarray(metad.retilt_profile(
            jnp.asarray(F0), D0, jnp.asarray(dg_eval), mp), np.float64)
        frac = np.stack([
            np.asarray(metad.fraction_at_ph(jnp.asarray(F0),
                                            jnp.asarray(pks),
                                            float(pH[g]), mp), np.float64)
            for g in range(G)])                               # (G, S)
    else:
        frac = np.stack([
            np.asarray(metad.deprotonated_fraction(jnp.asarray(V[g]), mp),
                       np.float64) for g in range(G)])        # (G, S)

    per_site, devs = [], []
    for i in range(S):
        pts = []
        for g in np.argsort(pH):
            hh = 1.0 / (1.0 + 10.0 ** (pks[i] - pH[g]))
            pts.append({"pH": float(pH[g]),
                        "deprotonated": float(frac[g, i]), "hh": hh})
            devs.append(abs(frac[g, i] - hh))
        per_site.append({"site": i, "pK": float(pks[i]), "curve": pts})
    # per-pK-class curves: sites of one class are chemically identical
    # model compounds, so their class-mean fraction is the estimator
    # with per-site V-table noise averaged down by sqrt(n_sites/class)
    # — the acceptance-bar quantity (VERDICT r4 task 1: per-class mean
    # abs dev <= 0.05)
    per_class, cdevs = [], []
    for pk in sorted(set(np.round(pks, 4).tolist())):
        sel = np.abs(pks - pk) < 1e-3
        if args.pooled:
            # pool the class's intrinsic profiles, then evaluate — the
            # class curve is the estimator on sqrt(n_sites) more data,
            # not the average of noisy per-site curves
            F0c = F0[sel].mean(0)
            cfrac = {g: float(np.asarray(metad.fraction_at_ph(
                jnp.asarray(F0c[None]), jnp.asarray(pks[sel][:1]),
                float(pH[g]), mp))[0]) for g in range(G)}
        pts = []
        for g in np.argsort(pH):
            hh = 1.0 / (1.0 + 10.0 ** (pk - pH[g]))
            mean_f = cfrac[g] if args.pooled else float(frac[g, sel].mean())
            pts.append({"pH": float(pH[g]), "deprotonated": mean_f,
                        "hh": hh})
            cdevs.append(abs(mean_f - hh))
        per_class.append({"pK": float(pk), "n_sites": int(sel.sum()),
                          "curve": pts})
    out = {
        "method": rep["method"],
        "estimator": ("pooled intrinsic profile (driving term subtracted, "
                      "profiles averaged over walkers/class sites, term "
                      "re-added per pH; metad.pooled_intrinsic_profile)"
                      if args.pooled else
                      "instantaneous converged V-table (final checkpoint), "
                      "NOT tail-averaged — see module docstring"),
        **pooled_info,
        "source_ckpt": args.ckpt,
        "chunks_done": int(d["chunks_done"]),
        "dG_ref": rep["dG_ref"],
        "metad": rep["metad"],
        "per_site": per_site,
        "per_class": per_class,
        "summary": {"mean_abs_dev": float(np.mean(devs)),
                    "max_abs_dev": float(np.max(devs)),
                    "class_mean_abs_dev": float(np.mean(cdevs)),
                    "class_max_abs_dev": float(np.max(cdevs))},
    }
    dst = args.out or args.ckpt.replace(
        ".npz", "_pooled_curves.json" if args.pooled else "_curves.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"chunks_done": out["chunks_done"],
                      **out["summary"], "out": dst}))


if __name__ == "__main__":
    main()
