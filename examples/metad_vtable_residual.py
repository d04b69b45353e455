"""V-table residual: per-(pH, site) ΔF vs Henderson–Hasselbalch.

The metadynamics campaign's bias tables ARE a free-energy measurement:
for walker at pH with site pK, the basin-split ΔF (metad.delta_f_sites)
must equal kT·ln10·(pK − pH). The median residual (measured − expected)
across mature walkers/sites is the fixed-point correction to ΔG_ref:

    ΔG_ref(corrected) = ΔG_ref(installed) + median residual

This is the diagnostic that caught the round-3 quick-TI mis-calibration
(−5.1 kcal median at ΔG_ref=−32.18 → long-TI agreed at ≈−39.5); round 4
runs it as stage gate: campaign stage 1 measures, stage 2 reruns on the
corrected landscape. Ref: the calibration burden the reference leaves to
the user's HB−HA inputs, /root/reference/fix_constant_pH.cpp:264-277.

  python examples/metad_vtable_residual.py \
      --ckpt examples/results/metad_ms_r4_ckpt.npz \
      --report examples/results/titration_metad_multisite_r4stage1_v5e.json
"""
from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="campaign checkpoint (.npz, stacked replicas)")
    ap.add_argument("--report", required=True,
                    help="campaign --out JSON (supplies per-site pK and "
                         "the MetadParams used)")
    ap.add_argument("--ph-skip", type=float, default=1.0,
                    help="exclude (pH, site) points with |pK - pH| > "
                         "this from the median: far-from-midpoint "
                         "basins saturate and carry no calibration "
                         "signal (ln10*kT*4 pH units = 5.5 kcal is "
                         "already beyond the WT fill depth)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from constant_ph_tpu import metad, units
    from constant_ph_tpu.tiled.layout import TiledState

    rep = json.load(open(args.report))
    pks = np.asarray([s["pK"] for s in rep["per_site"]])
    m = rep["metad"]
    mp = metad.MetadParams(nbins=m["nbins"], sigma=m["sigma"],
                           h0=m["h0"], gamma=m["gamma"],
                           stride=m["stride"], T=300.0)
    d = np.load(args.ckpt)
    fields = [f.name for f in dataclasses.fields(TiledState)]
    V = np.asarray(d[f"leaf{fields.index('metad_v')}"])   # (R, S, nbins)
    pH = np.asarray(d[f"leaf{fields.index('pH')}"], np.float64)  # (R,)
    kT = units.BOLTZ * 300.0
    S = V.shape[1]

    resid = np.full((len(pH), S), np.nan)
    pinned = 0
    for r in range(len(pH)):
        x = np.asarray(metad.deprotonated_fraction(jnp.asarray(V[r]), mp),
                       np.float64)
        dF = np.where((x > 1e-6) & (x < 1 - 1e-6),
                      -kT * np.log(np.clip(x, 1e-12, 1 - 1e-12)
                                   / np.clip(1 - x, 1e-12, 1 - 1e-12)),
                      np.nan)
        pinned += int(np.isnan(dF).sum())
        want = kT * np.log(10.0) * (pks - pH[r])
        resid[r] = dF - want

    sel = np.abs(pks[None, :] - pH[:, None]) <= args.ph_skip
    vals = resid[sel & np.isfinite(resid)]
    allv = resid[np.isfinite(resid)]
    med = float(np.median(vals)) if len(vals) else float("nan")
    per_class = {}
    for pk in sorted(set(np.round(pks, 3))):
        csel = sel & np.isfinite(resid) & (np.abs(pks[None, :] - pk) < 1e-3)
        cv = resid[csel]
        per_class[str(pk)] = (float(np.median(cv)) if len(cv)
                              else float("nan"))
    dg = rep["dG_ref"]
    out = {
        "ckpt": args.ckpt,
        "installed_dG_ref": dg,
        "chunks_done": rep["chunks_done"],
        "residual_median_kcal": med,
        "residual_iqr_kcal": ([float(np.percentile(vals, 25)),
                               float(np.percentile(vals, 75))]
                              if len(vals) else None),
        "n_points_near_midpoint": int(len(vals)),
        "residual_median_all_kcal": (float(np.median(allv))
                                     if len(allv) else None),
        "n_pinned": pinned,
        "n_points": int(resid.size),
        "per_class_median_near_midpoint": per_class,
        "corrected_dG_ref": dg + med if np.isfinite(med) else None,
        "what": "residual = basin dF (V tables) - kT*ln10*(pK-pH); "
                f"median over |pK-pH| <= {args.ph_skip}; correction is "
                "the fixed point dG_ref += median",
    }
    dst = args.out or args.ckpt.replace(".npz", "_residual.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"median": med, "corrected_dG_ref":
                      out["corrected_dG_ref"], "n": len(vals)}))


if __name__ == "__main__":
    main()
