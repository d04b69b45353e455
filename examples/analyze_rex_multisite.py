"""Aggregate the multisite pH-REX results by pK class.

Sites sharing a pK are statistical replicates of the same titration
curve (the polypeptide cycles 3 headgroup chemistries over 20 sites), so
class-aggregated curves carry 6-7x the per-site samples — the right
granularity for judging convergence against Henderson-Hasselbalch.

    python examples/analyze_rex_multisite.py [result.json]
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main():
    path = (sys.argv[1] if len(sys.argv) > 1
            else "examples/results/titration_rex_multisite_v5e.json")
    d = json.load(open(path))
    per_site = d["per_site"]
    classes: dict = {}
    for s in per_site:
        classes.setdefault(round(s["pK"], 3), []).append(s)

    out = {"source": path, "swaps_done": d["swaps_done"],
           "swap_acceptance": d["swap_acceptance"], "classes": []}
    all_devs = []
    for pk in sorted(classes):
        sites = classes[pk]
        phs = [pt["pH"] for pt in sites[0]["curve"]]
        rows = []
        for j, ph in enumerate(phs):
            meas = [s["curve"][j]["deprotonated"] for s in sites]
            n = sum(s["curve"][j]["n_blocks"] for s in sites)
            hh = sites[0]["curve"][j]["hh"]
            m = float(np.mean(meas))
            rows.append({"pH": ph, "deprotonated": m, "hh": hh,
                         "sem": float(np.std(meas) / max(1, len(meas))**0.5),
                         "n_blocks": n})
            all_devs.append(abs(m - hh))
        out["classes"].append({"pK": pk, "n_sites": len(sites),
                               "curve": rows})
    out["summary"] = {
        "mean_abs_dev": float(np.mean(all_devs)),
        "max_abs_dev": float(np.max(all_devs)),
        "n_points": len(all_devs),
    }
    outp = path.replace(".json", "_by_class.json")
    with open(outp, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["summary"]))
    for c in out["classes"]:
        print(f"# pK {c['pK']} ({c['n_sites']} sites):")
        for r in c["curve"]:
            bar = "#" * int(r["deprotonated"] * 40)
            print(f"#   pH {r['pH']:.2f}  meas {r['deprotonated']:.3f} "
                  f"(hh {r['hh']:.3f}, sem {r['sem']:.3f}) {bar}")


if __name__ == "__main__":
    main()
