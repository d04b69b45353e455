"""Aggregate the multisite metadynamics titration result by pK class.

Sites sharing a pK are statistical replicates of the same titration curve
(the polypeptide cycles 3 headgroup chemistries over 20 sites), so
class-aggregated curves carry 6-7x the per-site samples — the right
granularity for judging convergence against Henderson-Hasselbalch
(same rationale as analyze_rex_multisite.py, adapted to the metad
driver's report schema: no swap fields, tail-time-averaged estimator).

    python examples/analyze_metad_multisite.py [result.json]
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main():
    path = (sys.argv[1] if len(sys.argv) > 1
            else "examples/results/titration_metad_multisite_v5e.json")
    d = json.load(open(path))
    classes: dict = {}
    for s in d["per_site"]:
        classes.setdefault(round(s["pK"], 3), []).append(s)

    out = {"source": path, "method": d["method"],
           "estimator": d["estimator"], "chunks_done": d["chunks_done"],
           "n_rollbacks": d.get("n_rollbacks", 0), "classes": []}
    all_devs = []
    for pk in sorted(classes):
        sites = classes[pk]
        phs = [pt["pH"] for pt in sites[0]["curve"]]
        rows = []
        devs = []
        for j, ph in enumerate(phs):
            meas = [s["curve"][j]["deprotonated"] for s in sites]
            hh = sites[0]["curve"][j]["hh"]
            m = float(np.mean(meas))
            rows.append({"pH": ph, "deprotonated": m, "hh": hh,
                         "sem": float(np.std(meas)
                                      / max(1, len(meas)) ** 0.5),
                         "abs_dev": abs(m - hh)})
            devs.append(abs(m - hh))
        all_devs += devs
        out["classes"].append({"pK": pk, "n_sites": len(sites),
                               "curve": rows,
                               "mean_abs_dev": float(np.mean(devs)),
                               "max_abs_dev": float(np.max(devs))})
    out["summary"] = {"mean_abs_dev": float(np.mean(all_devs)),
                      "max_abs_dev": float(np.max(all_devs))}
    dst = path.replace(".json", "_by_class.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    for c in out["classes"]:
        print(f"pK {c['pK']}: mad={c['mean_abs_dev']:.4f} "
              f"max={c['max_abs_dev']:.4f} over {c['n_sites']} sites")
    print(f"ALL: mad={out['summary']['mean_abs_dev']:.4f} "
          f"max={out['summary']['max_abs_dev']:.4f} -> {dst}")


if __name__ == "__main__":
    main()
